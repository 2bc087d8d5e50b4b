// Golden-data generator for pathtracing_tpu.
//
// Compiles against the READ-ONLY reference tree via -I$REFERENCE_DIR and
// calls its public C-callable API (path_trace_pixel / tonemap_pixel /
// load_mesh / build_blas / build_tlas — see reference README.md:24-39) to
// dump ground-truth values the Python/JAX implementation is tested against.
// No reference code is copied; this file only *calls* it.
//
// Output container format ("GOLD"): sequence of named arrays,
//   [u32 name_len][name][char dtype f|u|i][u32 itemsize][u32 ndim][u64 dims...][raw]
//
// Build (no -ffast-math so the oracle is IEEE-deterministic):
//   g++ -O2 -std=c++17 -I$REF harness.cc $REF_OBJS -o harness -fopenmp

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <unistd.h>

#include "math.hh"
#include "mesh.hh"
#include "bvh.hh"
#include "scene.hh"
#include "ray_query.hh"
#include "path_tracer.hh"

static FILE* g_out = nullptr;

static void write_array(
    const char* name, char dtype, uint32_t itemsize,
    const std::vector<uint64_t>& dims, const void* data
){
    uint32_t name_len = strlen(name);
    fwrite(&name_len, 4, 1, g_out);
    fwrite(name, 1, name_len, g_out);
    fwrite(&dtype, 1, 1, g_out);
    fwrite(&itemsize, 4, 1, g_out);
    uint32_t ndim = dims.size();
    fwrite(&ndim, 4, 1, g_out);
    uint64_t total = 1;
    for(uint64_t d : dims){ fwrite(&d, 8, 1, g_out); total *= d; }
    fwrite(data, itemsize, total, g_out);
}

static void open_out(const char* path)
{
    g_out = fopen(path, "wb");
    if(!g_out){ fprintf(stderr, "cannot open %s\n", path); exit(1); }
    fwrite("GOLD", 1, 4, g_out);
}

// ---------------------------------------------------------------- rng ----
static void cmd_rng(const char* out_path)
{
    open_out(out_path);
    const uint4 seeds[] = {
        {1,2,3,4},
        {0,0,0,STUDENT_ID},
        {17,251,0,STUDENT_ID},
        {639,359,255u,STUDENT_ID},
        {320,180,(uint)-1,STUDENT_ID},  // sample_index=-1 cast to uint
        {0xFFFFFFFFu,0xFFFFFFFFu,0xFFFFFFFFu,0xFFFFFFFFu},
    };
    const int n_seeds = sizeof(seeds)/sizeof(seeds[0]);
    const int steps = 32;
    std::vector<uint32_t> states(n_seeds*steps*4);
    std::vector<float> uniforms(n_seeds*steps*4);
    for(int i = 0; i < n_seeds; ++i)
    {
        uint4 s = seeds[i];
        for(int j = 0; j < steps; ++j)
        {
            uint4 v = pcg4d(&s);
            states[(i*steps+j)*4+0] = v.x;
            states[(i*steps+j)*4+1] = v.y;
            states[(i*steps+j)*4+2] = v.z;
            states[(i*steps+j)*4+3] = v.w;
        }
        s = seeds[i];
        for(int j = 0; j < steps; ++j)
        {
            float4 u = generate_uniform_random4(&s);
            uniforms[(i*steps+j)*4+0] = u.x;
            uniforms[(i*steps+j)*4+1] = u.y;
            uniforms[(i*steps+j)*4+2] = u.z;
            uniforms[(i*steps+j)*4+3] = u.w;
        }
    }
    write_array("seeds", 'u', 4, { (uint64_t)n_seeds, 4 }, seeds);
    write_array("states", 'u', 4, { (uint64_t)n_seeds, steps, 4 }, states.data());
    write_array("uniforms", 'f', 4, { (uint64_t)n_seeds, steps, 4 }, uniforms.data());
    fclose(g_out);
}

// ---------------------------------------------------------------- mesh ----
static void dump_mesh_buffers(const mesh_buffers& mb, const char* prefix)
{
    std::string p(prefix);
    write_array((p+"indices").c_str(), 'u', 4, { mb.indices.size() }, mb.indices.data());
    // float3 has 16-byte alignment (padded); copy to packed triples.
    std::vector<float> pos(mb.pos.size()*3), nrm(mb.normal.size()*3);
    for(size_t i = 0; i < mb.pos.size(); ++i)
    { pos[i*3]=mb.pos[i].x; pos[i*3+1]=mb.pos[i].y; pos[i*3+2]=mb.pos[i].z; }
    for(size_t i = 0; i < mb.normal.size(); ++i)
    { nrm[i*3]=mb.normal[i].x; nrm[i*3+1]=mb.normal[i].y; nrm[i*3+2]=mb.normal[i].z; }
    write_array((p+"pos").c_str(), 'f', 4, { mb.pos.size(), 3 }, pos.data());
    write_array((p+"normal").c_str(), 'f', 4, { mb.normal.size(), 3 }, nrm.data());
    write_array((p+"albedo").c_str(), 'f', 4, { mb.albedo.size(), 4 }, mb.albedo.data());
    write_array((p+"material").c_str(), 'f', 4, { mb.material.size(), 4 }, mb.material.data());
}

static void dump_bvh_buffers(const bvh_buffers& bc, const char* prefix)
{
    std::string p(prefix);
    write_array((p+"nodes").c_str(), 'f', 4, { bc.nodes.size(), 6 }, bc.nodes.data());
    write_array((p+"links").c_str(), 'u', 4, { bc.links.size(), 2 }, bc.links.data());
}

static void cmd_mesh(const char* obj, const char* out_path)
{
    open_out(out_path);
    mesh_buffers mb;
    mesh m = load_mesh(mb, obj);
    uint32_t handle[4] = { m.vertex_count, m.triangle_count, m.index_offset, m.base_vertex_offset };
    write_array("handle", 'u', 4, {4}, handle);
    dump_mesh_buffers(mb, "");
    fclose(g_out);
}

static void cmd_blas(const char* obj, const char* out_path)
{
    open_out(out_path);
    mesh_buffers mb;
    mesh m = load_mesh(mb, obj);
    bvh_buffers bc;
    bvh b = build_blas(m, mb, bc);
    uint32_t handle[2] = { b.node_count, b.node_offset };
    write_array("bvh", 'u', 4, {2}, handle);
    dump_bvh_buffers(bc, "");
    fclose(g_out);
}

// --------------------------------------------------------------- scene ----
// Golden test scene: ground plane + teapot + rock0..rock4 with fixed
// transforms, reference-default light, fixed camera. Mirrored in
// tests/golden_scene.py — keep in sync!
struct golden_scene
{
    mesh_buffers mb;
    bvh_buffers bc;
    std::vector<tlas_instance> instances;
    bvh tlas;
    std::vector<subframe> subframes;
};

static void add_inst(
    golden_scene& gs, mesh m, bvh blas,
    float3 pos, float3 pyr_deg, float3 scale
){
    mat4 transform = scaling(scale);
    transform = mul_m4m4(rotation_euler(pyr_deg * (float)M_PI / 180.0f), transform);
    transform = mul_m4m4(translation(pos), transform);
    gs.instances.push_back(tlas_instance{blas, m, transform, inverse4(transform)});
}

static golden_scene build_golden_scene(const char* data_dir, const char* ground_obj)
{
    golden_scene gs;
    std::string d(data_dir);
    auto load = [&](const char* rel) {
        mesh m = load_mesh(gs.mb, (d + "/" + rel).c_str());
        bvh b = build_blas(m, gs.mb, gs.bc);
        return std::make_pair(m, b);
    };
    auto [ground_m, ground_b] = [&]{
        mesh m = load_mesh(gs.mb, ground_obj);
        bvh b = build_blas(m, gs.mb, gs.bc);
        return std::make_pair(m, b);
    }();
    auto [teapot_m, teapot_b] = load("teapot.obj");
    auto [r0_m, r0_b] = load("rock0.obj");
    auto [r1_m, r1_b] = load("rock1.obj");
    auto [r2_m, r2_b] = load("rock2.obj");
    auto [r3_m, r3_b] = load("rock3.obj");
    auto [r4_m, r4_b] = load("rock4.obj");

    add_inst(gs, ground_m, ground_b, {0,0,0}, {0,0,0}, {1,1,1});
    add_inst(gs, teapot_m, teapot_b, {0,0.0f,0}, {0,30,0}, {1,1,1});
    add_inst(gs, r0_m, r0_b, {-3,0,-1}, {0,70,0}, {1,1,1});
    add_inst(gs, r1_m, r1_b, {2.5f,0,-2}, {0,140,0}, {2,2,2});
    add_inst(gs, r2_m, r2_b, {4,0,3}, {0,200,0}, {1.5f,1.5f,1.5f});
    add_inst(gs, r3_m, r3_b, {-2.5f,0,3.5f}, {10,290,0}, {1,1,1});
    add_inst(gs, r4_m, r4_b, {0.5f,0,-5}, {0,15,0}, {3,3,3});

    std::vector<std::pair<const tlas_instance*, uint>> ti;
    for(uint i = 0; i < gs.instances.size(); ++i)
        ti.push_back({&gs.instances[i], i});
    gs.tlas = build_tlas(ti.size(), ti.data(), gs.bc, gs.bc);

    camera cam;
    cam.position = float3{7.0f, 4.5f, 11.0f};
    cam.aspect_ratio = IMAGE_WIDTH/float(IMAGE_HEIGHT);
    cam.orientation = extract_m4m3(rotation_euler(float3{16.0f, 327.5f, 0.0f} * (float)M_PI / 180.0f));
    cam.inv_focal_length = tan(60.0f * (float)M_PI / 360.0f);
    cam.focal_distance = 2.0f;
    cam.aperture_angle = (float)M_PI/16.0f;
    cam.aperture_polygon = 6;
    cam.aperture_radius = 0.0f;

    directional_light light;
    light.color = float3{4,4,4};
    light.cos_solid_angle = cos(4.0f * (float)M_PI / 180.0f);
    light.direction = normalize(float3{0,1,1});

    uint subframe_count =
        (SAMPLES_PER_PIXEL + SAMPLES_PER_MOTION_BLUR_STEP-1)
        / SAMPLES_PER_MOTION_BLUR_STEP;
    for(uint i = 0; i < subframe_count; ++i)
        gs.subframes.push_back(subframe{gs.tlas, cam, light});
    return gs;
}

static void dump_scene_arrays(golden_scene& gs, const std::string& p)
{
    dump_mesh_buffers(gs.mb, p.c_str());
    dump_bvh_buffers(gs.bc, p.c_str());
    // Per instance: 6 u32 (blas nc/no, mesh vc/tc/io/bvo) + 32 f32 (transform,
    // inv_transform, row-major).
    std::vector<uint32_t> inst_u(gs.instances.size()*6);
    std::vector<float> inst_f(gs.instances.size()*32);
    for(size_t i = 0; i < gs.instances.size(); ++i)
    {
        const tlas_instance& t = gs.instances[i];
        inst_u[i*6+0] = t.blas.node_count;
        inst_u[i*6+1] = t.blas.node_offset;
        inst_u[i*6+2] = t.m.vertex_count;
        inst_u[i*6+3] = t.m.triangle_count;
        inst_u[i*6+4] = t.m.index_offset;
        inst_u[i*6+5] = t.m.base_vertex_offset;
        memcpy(&inst_f[i*32], &t.transform, 16*4);
        memcpy(&inst_f[i*32+16], &t.inv_transform, 16*4);
    }
    write_array((p+"instances_u").c_str(), 'u', 4, { gs.instances.size(), 6 }, inst_u.data());
    write_array((p+"instances_f").c_str(), 'f', 4, { gs.instances.size(), 32 }, inst_f.data());

    // per-subframe rows: tlas handle + camera + light
    std::vector<uint32_t> sf_tlas;
    std::vector<float> sf_cam, sf_light;
    for(const subframe& sfr : gs.subframes)
    {
        sf_tlas.push_back(sfr.tlas.node_count);
        sf_tlas.push_back(sfr.tlas.node_offset);
        const camera& cc = sfr.cam;
        const float cf[18] = {
            cc.orientation.r[0].x, cc.orientation.r[0].y, cc.orientation.r[0].z,
            cc.orientation.r[1].x, cc.orientation.r[1].y, cc.orientation.r[1].z,
            cc.orientation.r[2].x, cc.orientation.r[2].y, cc.orientation.r[2].z,
            cc.position.x, cc.position.y, cc.position.z,
            cc.aspect_ratio, cc.inv_focal_length, cc.focal_distance,
            cc.aperture_angle, (float)cc.aperture_polygon, cc.aperture_radius
        };
        sf_cam.insert(sf_cam.end(), cf, cf+18);
        const directional_light& ll = sfr.light;
        const float lf[7] = {
            ll.direction.x, ll.direction.y, ll.direction.z,
            ll.color.x, ll.color.y, ll.color.z, ll.cos_solid_angle
        };
        sf_light.insert(sf_light.end(), lf, lf+7);
    }
    write_array((p+"sf_tlas").c_str(), 'u', 4, { gs.subframes.size(), 2 }, sf_tlas.data());
    write_array((p+"sf_cam").c_str(), 'f', 4, { gs.subframes.size(), 18 }, sf_cam.data());
    write_array((p+"sf_light").c_str(), 'f', 4, { gs.subframes.size(), 7 }, sf_light.data());
}

static void dump_scene(golden_scene& gs, const char* out_path)
{
    open_out(out_path);
    dump_scene_arrays(gs, "");
    uint32_t tl[2] = { gs.tlas.node_count, gs.tlas.node_offset };
    write_array("tlas", 'u', 4, {2}, tl);
    const camera& c = gs.subframes[0].cam;
    float cam_f[18] = {
        c.orientation.r[0].x, c.orientation.r[0].y, c.orientation.r[0].z,
        c.orientation.r[1].x, c.orientation.r[1].y, c.orientation.r[1].z,
        c.orientation.r[2].x, c.orientation.r[2].y, c.orientation.r[2].z,
        c.position.x, c.position.y, c.position.z,
        c.aspect_ratio, c.inv_focal_length, c.focal_distance,
        c.aperture_angle, (float)c.aperture_polygon, c.aperture_radius
    };
    write_array("camera", 'f', 4, {18}, cam_f);
    const directional_light& l = gs.subframes[0].light;
    float light_f[7] = {
        l.direction.x, l.direction.y, l.direction.z,
        l.color.x, l.color.y, l.color.z, l.cos_solid_angle
    };
    write_array("light", 'f', 4, {7}, light_f);
    fclose(g_out);
}

// --------------------------------------------------------------- trace ----
static void cmd_trace(
    golden_scene& gs, const char* out_path,
    int px_stride, int py_stride, int n_samples
){
    open_out(out_path);
    std::vector<uint32_t> keys;
    std::vector<float> radiance;
    for(uint y = 0; y < IMAGE_HEIGHT; y += py_stride)
    for(uint x = 0; x < IMAGE_WIDTH; x += px_stride)
    for(int s = 0; s < n_samples; ++s)
    {
        float3 c = path_trace_pixel(
            uint2{x, y}, s,
            gs.subframes.data(), gs.instances.data(),
            gs.bc.nodes.data(), gs.bc.links.data(),
            gs.mb.indices.data(), gs.mb.pos.data(), gs.mb.normal.data(),
            gs.mb.albedo.data(), gs.mb.material.data()
        );
        keys.push_back(x); keys.push_back(y); keys.push_back((uint32_t)s);
        radiance.push_back(c.x); radiance.push_back(c.y); radiance.push_back(c.z);
    }
    uint64_t n = keys.size()/3;
    write_array("keys", 'u', 4, { n, 3 }, keys.data());
    write_array("radiance", 'f', 4, { n, 3 }, radiance.data());

    // Bokeh variant: thin-lens aperture on (tests sample_regular_polygon
    // and the focal-distance ray setup, reference: path_tracer.hh:434-450).
    for(subframe& sf : gs.subframes)
    {
        sf.cam.aperture_radius = 0.3f;
        sf.cam.focal_distance = 10.0f;
        sf.cam.aperture_angle = (float)M_PI/7.0f;
    }
    std::vector<uint32_t> bkeys;
    std::vector<float> bradiance;
    for(uint y = 0; y < IMAGE_HEIGHT; y += py_stride)
    for(uint x = 0; x < IMAGE_WIDTH; x += px_stride)
    for(int s2 = 0; s2 < n_samples; ++s2)
    {
        float3 c = path_trace_pixel(
            uint2{x, y}, s2,
            gs.subframes.data(), gs.instances.data(),
            gs.bc.nodes.data(), gs.bc.links.data(),
            gs.mb.indices.data(), gs.mb.pos.data(), gs.mb.normal.data(),
            gs.mb.albedo.data(), gs.mb.material.data()
        );
        bkeys.push_back(x); bkeys.push_back(y); bkeys.push_back((uint32_t)s2);
        bradiance.push_back(c.x); bradiance.push_back(c.y); bradiance.push_back(c.z);
    }
    write_array("bokeh_keys", 'u', 4, { bkeys.size()/3, 3 }, bkeys.data());
    write_array("bokeh_radiance", 'f', 4, { bkeys.size()/3, 3 }, bradiance.data());

    // Tonemap goldens over a sweep of radiance values.
    std::vector<float> tin;
    std::vector<uint8_t> tout;
    for(int i = 0; i < 64; ++i)
    {
        float v = i / 16.0f;
        float3 col = {v, v*0.5f, 4.0f - v};
        uchar4 o = tonemap_pixel(col);
        tin.push_back(col.x); tin.push_back(col.y); tin.push_back(col.z);
        tout.push_back(o.x); tout.push_back(o.y); tout.push_back(o.z); tout.push_back(o.w);
    }
    write_array("tonemap_in", 'f', 4, { tin.size()/3, 3 }, tin.data());
    write_array("tonemap_out", 'u', 1, { tout.size()/4, 4 }, tout.data());
    fclose(g_out);
}

// -------------------------------------------------------------- motion ----
// Motion-blur golden: rebuild the golden scene with DISTINCT subframes
// (teapot translating, sun moving) like setup_animation_frame does
// (reference: scene.cc:648-717), then trace samples spanning subframes.
static void cmd_motion(const char* data_dir, const char* ground_obj, const char* out_path)
{
    golden_scene gs = build_golden_scene(data_dir, ground_obj);
    // drop the prebuilt single TLAS and rebuild per-subframe with a moving
    // teapot (instance 1)
    pop_bvh(gs.bc, gs.tlas);
    gs.subframes.clear();

    const int n_subframes = 4;
    camera cam = {};
    cam.position = float3{7.0f, 4.5f, 11.0f};
    cam.aspect_ratio = IMAGE_WIDTH/float(IMAGE_HEIGHT);
    cam.orientation = extract_m4m3(rotation_euler(float3{16.0f, 327.5f, 0.0f} * (float)M_PI / 180.0f));
    cam.inv_focal_length = tan(60.0f * (float)M_PI / 360.0f);
    cam.focal_distance = 2.0f;
    cam.aperture_angle = (float)M_PI/16.0f;
    cam.aperture_polygon = 6;
    cam.aperture_radius = 0.0f;

    // teapot instances per subframe appended after the static ones
    uint static_count = gs.instances.size();
    for(int i = 0; i < n_subframes; ++i)
    {
        mesh m = gs.instances[1].m;
        bvh b = gs.instances[1].blas;
        mat4 t = rotation_euler(float3{0, 30.0f + 20.0f*i, 0} * (float)M_PI / 180.0f);
        t = mul_m4m4(translation(float3{0.5f*i, 0, 0.3f*i}), t);
        gs.instances.push_back(tlas_instance{b, m, t, inverse4(t)});
    }

    std::vector<bvh_buffers> local(n_subframes);
    for(int i = 0; i < n_subframes; ++i)
    {
        std::vector<std::pair<const tlas_instance*, uint>> ti;
        for(uint k = 0; k < static_count; ++k)
            if(k != 1)  // static set minus the original teapot
                ti.push_back({&gs.instances[k], k});
        ti.push_back({&gs.instances[static_count + i], (uint)(static_count + i)});
        subframe sf;
        sf.tlas = build_tlas(ti.size(), ti.data(), gs.bc, local[i]);
        sf.cam = cam;
        float st = 0.1f + 0.2f * i;
        sf.light.direction = normalize(float3{0, sinf(st), cosf(st)});
        sf.light.color = float3{4,4,4};
        sf.light.cos_solid_angle = cos(4.0f * (float)M_PI / 180.0f);
        gs.subframes.push_back(sf);
    }
    for(int i = 0; i < n_subframes; ++i)
    {
        gs.subframes[i].tlas.node_offset = gs.bc.nodes.size();
        gs.bc.nodes.insert(gs.bc.nodes.end(), local[i].nodes.begin(), local[i].nodes.end());
        gs.bc.links.insert(gs.bc.links.end(), local[i].links.begin(), local[i].links.end());
    }

    open_out(out_path);
    dump_scene_arrays(gs, "mb_");
    // trace 32 samples (4 subframes x 8) at object pixels
    std::vector<uint32_t> keys;
    std::vector<float> radiance;
    for(uint y = 120; y < IMAGE_HEIGHT; y += 60)
    for(uint x = 200; x < 560; x += 60)
    for(int s = 0; s < 32; ++s)
    {
        float3 c = path_trace_pixel(
            uint2{x, y}, s,
            gs.subframes.data(), gs.instances.data(),
            gs.bc.nodes.data(), gs.bc.links.data(),
            gs.mb.indices.data(), gs.mb.pos.data(), gs.mb.normal.data(),
            gs.mb.albedo.data(), gs.mb.material.data()
        );
        keys.push_back(x); keys.push_back(y); keys.push_back((uint32_t)s);
        radiance.push_back(c.x); radiance.push_back(c.y); radiance.push_back(c.z);
    }
    uint64_t n = keys.size()/3;
    write_array("keys", 'u', 4, { n, 3 }, keys.data());
    write_array("radiance", 'f', 4, { n, 3 }, radiance.data());
    fclose(g_out);
}

// ---------------------------------------------------------------- bsdf ----
// Kernel-level goldens: bsdf() eval and sample_bsdf() over a deterministic
// sweep of materials, view/light directions, and RNG values.
static void cmd_bsdf(const char* out_path)
{
    open_out(out_path);
    uint4 seed = {77, 88, 99, 11};
    const int N = 2048;
    std::vector<float> inputs;   // per case: light3 view3 albedo3 rough metal trans eta u3
    std::vector<float> eval_out; // color3 pdf
    std::vector<float> samp_out; // dir3 atten3 pdf
    for(int i = 0; i < N; ++i)
    {
        float4 a = generate_uniform_random4(&seed);
        float4 b = generate_uniform_random4(&seed);
        float4 c = generate_uniform_random4(&seed);
        float4 d = generate_uniform_random4(&seed);

        float ct = a.x * 2.0f - 1.0f;
        float st = sqrt(fmax(0.0f, 1.0f - ct*ct));
        float ph = a.y * 2.0f * (float)M_PI;
        float3 light = {st*cosf(ph), st*sinf(ph), ct};
        float cv = fmax(a.z, 1e-3f);
        float sv = sqrt(fmax(0.0f, 1.0f - cv*cv));
        float pv = a.w * 2.0f * (float)M_PI;
        float3 view = {sv*cosf(pv), sv*sinf(pv), cv};

        float3 albedo = {b.x, b.y, b.z};
        float rough = b.w * b.w;
        float metal = c.x > 0.5f ? c.y : 0.0f;
        float trans = c.z > 0.7f ? c.w : 0.0f;
        float eta = (i & 1) ? 1.5f : 1.0f/1.5f;
        float3 u = {d.x, d.y, d.z};

        float pdf = 0;
        float3 col = bsdf(light, view, albedo, rough, metal, trans, eta, &pdf);

        float3 out_dir, out_att;
        float out_pdf;
        sample_bsdf(u, view, albedo, rough, metal, trans, eta,
                    &out_dir, &out_att, &out_pdf);

        const float in_row[] = {light.x,light.y,light.z, view.x,view.y,view.z,
            albedo.x,albedo.y,albedo.z, rough, metal, trans, eta, u.x,u.y,u.z};
        inputs.insert(inputs.end(), in_row, in_row+16);
        const float ev[] = {col.x, col.y, col.z, pdf};
        eval_out.insert(eval_out.end(), ev, ev+4);
        const float sp[] = {out_dir.x,out_dir.y,out_dir.z,
            out_att.x,out_att.y,out_att.z, out_pdf};
        samp_out.insert(samp_out.end(), sp, sp+7);
    }
    write_array("inputs", 'f', 4, { (uint64_t)N, 16 }, inputs.data());
    write_array("eval", 'f', 4, { (uint64_t)N, 4 }, eval_out.data());
    write_array("sample", 'f', 4, { (uint64_t)N, 7 }, samp_out.data());
    fclose(g_out);
}

// --------------------------------------------------------------- debug ----
// Re-drives the reference's per-sample loop step by step (calling its inline
// API) and prints per-bounce internals for divergence triage.
static void cmd_debug(golden_scene& gs, uint x, uint y, int sample_index)
{
    uint subframe_index = sample_index < 0 ? 0 : sample_index / SAMPLES_PER_MOTION_BLUR_STEP;
    subframe sf = gs.subframes[subframe_index];

    uint4 seed = {x, y, (uint)sample_index, STUDENT_ID};
    pcg4d(&seed);
    float4 u = generate_uniform_random4(&seed);
    float2 film_offset = sample_gaussian_weighted_disk((float2){u.x, u.y}, 0.4f);
    film_offset.x += 0.5f; film_offset.y += 0.5f;
    float3 ray_dir, ray_o;
    get_camera_ray(sf.cam, (float2){u.z, u.w},
        (float2){x + film_offset.x, y + film_offset.y}, &ray_dir, &ray_o);
    printf("u0 %.9g %.9g %.9g %.9g\n", u.x, u.y, u.z, u.w);
    printf("ray_o %.9g %.9g %.9g dir %.9g %.9g %.9g\n",
        ray_o.x, ray_o.y, ray_o.z, ray_dir.x, ray_dir.y, ray_dir.z);

    pt_context ctx;
    ctx.tlas = sf.tlas;
    ctx.instances = gs.instances.data();
    ctx.node_array = gs.bc.nodes.data();
    ctx.link_array = gs.bc.links.data();
    ctx.mesh_indices = gs.mb.indices.data();
    ctx.mesh_pos = gs.mb.pos.data();
    ctx.mesh_normal = gs.mb.normal.data();
    ctx.mesh_albedo = gs.mb.albedo.data();
    ctx.mesh_material = gs.mb.material.data();
    ctx.light = sf.light;

    hit_info info = trace_ray(ctx, ray_o, ray_dir, 0.0f);
    float3 attenuation = {1,1,1};
    float3 contribution = {0,0,0};
    float3 in_scatter;
    nishita_atmosphere_scattering(&seed, ctx, ray_o, ray_dir, info.thit, &attenuation, &in_scatter);
    contribution += in_scatter + attenuation * info.albedo * info.emission;
    printf("primary thit %.9g contrib %.9g %.9g %.9g\n", info.thit,
        contribution.x, contribution.y, contribution.z);

    float regularization = 1.0f;
    for(uint bounce = 0; bounce < MAX_BOUNCES && info.thit > 0; ++bounce)
    {
        float3 view = mul_v3m3(-ray_dir, info.tbn);
        if(view.z < 1e-7f) view = (float3){view.x, view.y, fmax(view.z, 1e-7f)};
        view = normalize(view);

        float3 nee = nee_branch(&seed, ctx, info, view);
        contribution += attenuation * nee;
        printf("bounce %u nee %.9g %.9g %.9g rough %.9g\n", bounce, nee.x, nee.y, nee.z, info.roughness);

        float4 u = generate_uniform_random4(&seed);
        float3 tdir;
        float3 bsdf_attenuation;
        float bsdf_pdf;
        sample_bsdf((float3){u.x, u.y, u.z}, view,
            info.albedo, info.roughness, info.metallic, info.transmission,
            info.eta, &tdir, &bsdf_attenuation, &bsdf_pdf);
        printf("bounce %u u %.9g %.9g %.9g tdir %.9g %.9g %.9g pdf %.9g\n",
            bounce, u.x, u.y, u.z, tdir.x, tdir.y, tdir.z, bsdf_pdf);

        ray_dir = normalize(mul_m3v3(info.tbn, tdir));
        ray_o = info.pos;
        info = trace_ray(ctx, ray_o, ray_dir, MIN_RAY_DIST);
        printf("bounce %u dir %.9g %.9g %.9g thit %.9g alb %.9g %.9g %.9g em %.9g\n",
            bounce, ray_dir.x, ray_dir.y, ray_dir.z, info.thit,
            info.albedo.x, info.albedo.y, info.albedo.z, info.emission);

        float mis_pdf = bsdf_pdf < 0 ? -bsdf_pdf :
            (info.nee_pdf * info.nee_pdf + bsdf_pdf * bsdf_pdf) / bsdf_pdf;
        attenuation *= bsdf_attenuation;
        float3 atmosphere_attenuation;
        float3 in_scatter;
        nishita_atmosphere_scattering(&seed, ctx, ray_o, ray_dir, info.thit, &atmosphere_attenuation, &in_scatter);
        contribution += attenuation * (in_scatter + atmosphere_attenuation * info.albedo * info.emission) / mis_pdf;
        attenuation *= atmosphere_attenuation / fabs(bsdf_pdf);
        printf("bounce %u mis %.9g contrib %.9g %.9g %.9g atten %.9g %.9g %.9g\n",
            bounce, mis_pdf, contribution.x, contribution.y, contribution.z,
            attenuation.x, attenuation.y, attenuation.z);
        if(bsdf_pdf > 0.0f)
            regularization *= fmax(1 - PATH_SPACE_REGULARIZATION_GAMMA / pow(bsdf_pdf, 0.25f), 0.0f);
        info.roughness = 1.0f - (1.0f - info.roughness) * regularization;
    }
    printf("final %.9g %.9g %.9g\n", contribution.x, contribution.y, contribution.z);
}

// ---------------------------------------------------------------- rays ----
// Deterministic ray batch traced with closest-hit (confirm-all) and any-hit
// semantics, for traversal-only golden tests.
static void cmd_rays(golden_scene& gs, const char* out_path, int n_rays)
{
    open_out(out_path);
    uint4 seed = {9, 8, 7, 6};
    std::vector<float> origins, dirs, thit, bary;
    std::vector<uint32_t> inst, prim, back, occluded;
    for(int i = 0; i < n_rays; ++i)
    {
        float4 u = generate_uniform_random4(&seed);
        float4 v = generate_uniform_random4(&seed);
        float3 org = {u.x*24.0f-12.0f, u.y*10.0f+0.2f, u.z*24.0f-12.0f};
        float ct = v.x*2.0f-1.0f;
        float st = sqrt(fmax(0.0f, 1.0f-ct*ct));
        float phi = v.y*2.0f*(float)M_PI;
        float3 dir = {st*cos(phi), ct, st*sin(phi)};

        pt_context ctx;
        ctx.tlas = gs.tlas;
        ctx.instances = gs.instances.data();
        ctx.node_array = gs.bc.nodes.data();
        ctx.link_array = gs.bc.links.data();
        ctx.mesh_indices = gs.mb.indices.data();
        ctx.mesh_pos = gs.mb.pos.data();

        ray_query rq = ray_query_initialize(
            ctx.tlas, ctx.instances, ctx.node_array, ctx.link_array,
            ctx.mesh_indices, ctx.mesh_pos, org, dir, 0.0f, 1e9f
        );
        while(ray_query_proceed(&rq)) ray_query_confirm(&rq);

        origins.push_back(org.x); origins.push_back(org.y); origins.push_back(org.z);
        dirs.push_back(dir.x); dirs.push_back(dir.y); dirs.push_back(dir.z);
        thit.push_back(rq.closest.thit);
        bary.push_back(rq.closest.barycentrics.x);
        bary.push_back(rq.closest.barycentrics.y);
        bary.push_back(rq.closest.barycentrics.z);
        inst.push_back(rq.closest.instance_id);
        prim.push_back(rq.closest.primitive_id);
        back.push_back(rq.closest.back_face ? 1 : 0);

        ray_query rq2 = ray_query_initialize(
            ctx.tlas, ctx.instances, ctx.node_array, ctx.link_array,
            ctx.mesh_indices, ctx.mesh_pos, org, dir, 1e-4f, 1e9f
        );
        occluded.push_back(ray_query_proceed(&rq2) ? 1 : 0);
    }
    uint64_t n = (uint64_t)n_rays;
    write_array("origins", 'f', 4, { n, 3 }, origins.data());
    write_array("dirs", 'f', 4, { n, 3 }, dirs.data());
    write_array("thit", 'f', 4, { n }, thit.data());
    write_array("bary", 'f', 4, { n, 3 }, bary.data());
    write_array("inst", 'u', 4, { n }, inst.data());
    write_array("prim", 'u', 4, { n }, prim.data());
    write_array("back", 'u', 4, { n }, back.data());
    write_array("occluded", 'u', 4, { n }, occluded.data());
    fclose(g_out);
}

// -------------------------------------------------------------- render ----
static void cmd_render(golden_scene& gs, const char* out_path, int spp)
{
    open_out(out_path);
    std::vector<float> colors(IMAGE_WIDTH*IMAGE_HEIGHT*3);
    std::vector<uint8_t> image(IMAGE_WIDTH*IMAGE_HEIGHT*4);
    #pragma omp parallel for
    for(uint i = 0; i < IMAGE_WIDTH * IMAGE_HEIGHT; ++i)
    {
        uint x = i % IMAGE_WIDTH;
        uint y = i / IMAGE_WIDTH;
        float3 c = {0,0,0};
        for(int j = 0; j < spp; ++j)
        {
            c += path_trace_pixel(
                uint2{x, y}, j,
                gs.subframes.data(), gs.instances.data(),
                gs.bc.nodes.data(), gs.bc.links.data(),
                gs.mb.indices.data(), gs.mb.pos.data(), gs.mb.normal.data(),
                gs.mb.albedo.data(), gs.mb.material.data()
            );
        }
        c /= (float)spp;
        colors[i*3] = c.x; colors[i*3+1] = c.y; colors[i*3+2] = c.z;
        uchar4 o = tonemap_pixel(c);
        image[i*4] = o.x; image[i*4+1] = o.y; image[i*4+2] = o.z; image[i*4+3] = o.w;
    }
    uint64_t w = IMAGE_WIDTH, h = IMAGE_HEIGHT;
    write_array("colors", 'f', 4, { h, w, 3 }, colors.data());
    write_array("image_bgra", 'u', 1, { h, w, 4 }, image.data());
    fclose(g_out);
}

// ----------------------------------------------------------- animframe ----
// Renders a frame of the reference's REAL hard-coded animation through its
// own load_scene()/setup_animation_frame() (scene.cc), with the working
// directory set so "data/*.obj" resolves to a prepared asset dir (real
// assets + generated substitutes for the stripped terrain/bunny/pine blobs).
// This is the full-pipeline ground truth: animation table, placement,
// terrain recolor, per-subframe TLAS builds, camera and sun — all the
// reference's code, none of ours.
static void cmd_animframe(const char* workdir, int frame, int spp, const char* out_path)
{
    if(chdir(workdir)) { perror("chdir"); exit(1); }
    scene s = load_scene();
    setup_animation_frame(s, (uint)frame);
    open_out(out_path);
    std::vector<float> colors(IMAGE_WIDTH*IMAGE_HEIGHT*3);
    std::vector<uint8_t> image(IMAGE_WIDTH*IMAGE_HEIGHT*4);
    #pragma omp parallel for
    for(uint i = 0; i < IMAGE_WIDTH * IMAGE_HEIGHT; ++i)
    {
        uint x = i % IMAGE_WIDTH;
        uint y = i / IMAGE_WIDTH;
        float3 c = {0,0,0};
        for(int j = 0; j < spp; ++j)
        {
            c += path_trace_pixel(
                uint2{x, y}, j,
                s.subframes.data(), s.instances.data(),
                s.bvh_buf.nodes.data(), s.bvh_buf.links.data(),
                s.mesh_buf.indices.data(), s.mesh_buf.pos.data(),
                s.mesh_buf.normal.data(),
                s.mesh_buf.albedo.data(), s.mesh_buf.material.data()
            );
        }
        c /= (float)spp;
        colors[i*3] = c.x; colors[i*3+1] = c.y; colors[i*3+2] = c.z;
        uchar4 o = tonemap_pixel(c);
        image[i*4] = o.x; image[i*4+1] = o.y; image[i*4+2] = o.z; image[i*4+3] = o.w;
    }
    uint64_t w = IMAGE_WIDTH, h = IMAGE_HEIGHT;
    write_array("colors", 'f', 4, { h, w, 3 }, colors.data());
    write_array("image_bgra", 'u', 1, { h, w, 4 }, image.data());
    fclose(g_out);
}

// ----------------------------------------------------------- animrange ----
// Batch variant of animframe: ONE load_scene() serves frames
// [first, first+count*stride) stepping by stride, writing
// OUT_PREFIX%04d.gold each — the per-frame scene reload dominated the
// 1800-frame validation oracle (tools/full_validation.py) otherwise.
static void cmd_animrange(const char* workdir, int first, int count,
                          int stride, int spp, const char* out_prefix)
{
    if(chdir(workdir)) { perror("chdir"); exit(1); }
    scene s = load_scene();
    std::vector<float> colors(IMAGE_WIDTH*IMAGE_HEIGHT*3);
    std::vector<uint8_t> image(IMAGE_WIDTH*IMAGE_HEIGHT*4);
    for(int k = 0; k < count; ++k)
    {
        int frame = first + k * stride;
        char out_path[4096];
        snprintf(out_path, sizeof out_path, "%s%04d.gold", out_prefix, frame);
        // skip frames that already exist (resume)
        FILE* probe = fopen(out_path, "rb");
        if(probe) { fclose(probe); continue; }
        setup_animation_frame(s, (uint)frame);
        #pragma omp parallel for
        for(uint i = 0; i < IMAGE_WIDTH * IMAGE_HEIGHT; ++i)
        {
            uint x = i % IMAGE_WIDTH;
            uint y = i / IMAGE_WIDTH;
            float3 c = {0,0,0};
            for(int j = 0; j < spp; ++j)
            {
                c += path_trace_pixel(
                    uint2{x, y}, j,
                    s.subframes.data(), s.instances.data(),
                    s.bvh_buf.nodes.data(), s.bvh_buf.links.data(),
                    s.mesh_buf.indices.data(), s.mesh_buf.pos.data(),
                    s.mesh_buf.normal.data(),
                    s.mesh_buf.albedo.data(), s.mesh_buf.material.data()
                );
            }
            c /= (float)spp;
            colors[i*3] = c.x; colors[i*3+1] = c.y; colors[i*3+2] = c.z;
            uchar4 o = tonemap_pixel(c);
            image[i*4] = o.x; image[i*4+1] = o.y;
            image[i*4+2] = o.z; image[i*4+3] = o.w;
        }
        uint64_t w = IMAGE_WIDTH, h = IMAGE_HEIGHT;
        open_out(out_path);
        write_array("colors", 'f', 4, { h, w, 3 }, colors.data());
        write_array("image_bgra", 'u', 1, { h, w, 4 }, image.data());
        fclose(g_out);
    }
}

int main(int argc, char** argv)
{
    setlocale(LC_ALL, "C");
    if(argc < 3)
    {
        fprintf(stderr,
            "usage:\n"
            "  harness rng OUT\n"
            "  harness mesh OBJ OUT\n"
            "  harness blas OBJ OUT\n"
            "  harness scene DATA_DIR GROUND_OBJ OUT\n"
            "  harness trace DATA_DIR GROUND_OBJ OUT XSTRIDE YSTRIDE NSAMPLES\n"
            "  harness render DATA_DIR GROUND_OBJ OUT SPP\n"
            "  harness animframe WORKDIR FRAME SPP OUT\n"
            "  harness animrange WORKDIR FIRST COUNT STRIDE SPP OUT_PREFIX\n");
        return 1;
    }
    std::string cmd = argv[1];
    if(cmd == "rng") cmd_rng(argv[2]);
    else if(cmd == "bsdf") cmd_bsdf(argv[2]);
    else if(cmd == "mesh") cmd_mesh(argv[2], argv[3]);
    else if(cmd == "blas") cmd_blas(argv[2], argv[3]);
    else if(cmd == "scene")
    {
        golden_scene gs = build_golden_scene(argv[2], argv[3]);
        dump_scene(gs, argv[4]);
    }
    else if(cmd == "trace")
    {
        golden_scene gs = build_golden_scene(argv[2], argv[3]);
        cmd_trace(gs, argv[4], atoi(argv[5]), atoi(argv[6]), atoi(argv[7]));
    }
    else if(cmd == "debug")
    {
        golden_scene gs = build_golden_scene(argv[2], argv[3]);
        cmd_debug(gs, atoi(argv[4]), atoi(argv[5]), atoi(argv[6]));
    }
    else if(cmd == "motion")
        cmd_motion(argv[2], argv[3], argv[4]);
    else if(cmd == "rays")
    {
        golden_scene gs = build_golden_scene(argv[2], argv[3]);
        cmd_rays(gs, argv[4], atoi(argv[5]));
    }
    else if(cmd == "render")
    {
        golden_scene gs = build_golden_scene(argv[2], argv[3]);
        cmd_render(gs, argv[4], atoi(argv[5]));
    }
    else if(cmd == "animframe")
        cmd_animframe(argv[2], atoi(argv[3]), atoi(argv[4]), argv[5]);
    else if(cmd == "animrange")
        cmd_animrange(argv[2], atoi(argv[3]), atoi(argv[4]), atoi(argv[5]),
                      atoi(argv[6]), argv[7]);
    else { fprintf(stderr, "unknown command %s\n", cmd.c_str()); return 1; }
    return 0;
}
