// Native OBJ/MTL loader for pathtracing_tpu.
//
// Fresh implementation with the same observable semantics as the reference
// parser (reference: mesh.cc:110-265) and as io/obj.py (golden-tested
// against both): v/vn/vt/f/usemtl/mtllib commands, exactly 3 face vertices
// per 'f' line, vertex dedup by (pos, tex, normal, material) in first-seen
// order, per-vertex material baking with the emission/transmission
// scalarization rules (reference: mesh.cc:241-252).
//
// C ABI consumed via ctypes (io/obj.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cctype>
#include <cmath>
#include <string>
#include <vector>
#include <unordered_map>

namespace {

struct Mtl
{
    std::string name;
    float albedo[3] = {1, 1, 1};
    float alpha = 0;
    float emission[3] = {0, 0, 0};
    float roughness = 1;
    float metallic = 0;
    float transmission[3] = {0, 0, 0};
};

static char* read_file(const char* path, size_t* out_size)
{
    FILE* f = fopen(path, "rb");
    if(!f) return nullptr;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    char* data = (char*)malloc(sz + 1);
    if(fread(data, 1, sz, f) != (size_t)sz)
    {
        fclose(f);
        free(data);
        return nullptr;
    }
    data[sz] = 0;
    fclose(f);
    *out_size = sz;
    return data;
}

static std::string read_token(char*& str)
{
    while(isspace((unsigned char)*str)) ++str;
    char* start = str;
    while(*str && !isspace((unsigned char)*str)) ++str;
    return std::string(start, str - start);
}

static void skip_line(char*& str)
{
    while(*str && *str != '\n') ++str;
}

static bool load_mtl(std::vector<Mtl>& materials, const char* path)
{
    size_t sz;
    char* data = read_file(path, &sz);
    if(!data) return false;
    char* str = data;
    Mtl* mat = nullptr;
    while(*str)
    {
        while(isspace((unsigned char)*str)) ++str;
        char* cmd = str;
        int cmd_len = 0;
        while(*str && !isspace((unsigned char)*str)) { ++str; ++cmd_len; }
        auto is = [&](const char* name) {
            return strncmp(cmd, name, cmd_len) == 0 && (int)strlen(name) == cmd_len;
        };
        if(is("newmtl"))
        {
            materials.push_back(Mtl{});
            materials.back().name = read_token(str);
            mat = &materials.back();
        }
        else if(!mat) {}
        else if(is("Kd"))
        {
            mat->albedo[0] = strtof(str, &str);
            mat->albedo[1] = strtof(str, &str);
            mat->albedo[2] = strtof(str, &str);
        }
        else if(is("Ke"))
        {
            mat->emission[0] = strtof(str, &str);
            mat->emission[1] = strtof(str, &str);
            mat->emission[2] = strtof(str, &str);
        }
        else if(is("d"))
            mat->alpha = strtof(str, &str);
        else if(is("Pr"))
            mat->roughness = strtof(str, &str);
        else if(is("Pm"))
            mat->metallic = strtof(str, &str);
        else if(is("Tf"))
        {
            mat->transmission[0] = strtof(str, &str);
            mat->transmission[1] = strtof(str, &str);
            mat->transmission[2] = strtof(str, &str);
        }
        skip_line(str);
    }
    free(data);
    return true;
}

struct Key
{
    int p, t, n, m;
    bool operator==(const Key& o) const
    {
        return p == o.p && t == o.t && n == o.n && m == o.m;
    }
};

struct KeyHash
{
    size_t operator()(const Key& k) const
    {
        uint64_t h = 1469598103934665603ull;
        for(int v : {k.p, k.t, k.n, k.m})
        {
            h ^= (uint64_t)(uint32_t)v;
            h *= 1099511628211ull;
        }
        return (size_t)h;
    }
};

}  // namespace

extern "C" {

struct pt_mesh_out
{
    uint32_t vertex_count;
    uint32_t triangle_count;
    uint32_t* indices;   // triangle_count*3
    float* pos;          // vertex_count*3
    float* normal;       // vertex_count*3
    float* albedo;       // vertex_count*4
    float* material;     // vertex_count*4
};

void pt_free_mesh(pt_mesh_out* out)
{
    free(out->indices);
    free(out->pos);
    free(out->normal);
    free(out->albedo);
    free(out->material);
    memset(out, 0, sizeof(*out));
}

// Returns 0 on success, nonzero on error.
int pt_load_obj(const char* obj_path, pt_mesh_out* out)
{
    memset(out, 0, sizeof(*out));
    size_t sz;
    char* data = read_file(obj_path, &sz);
    if(!data) return 1;

    std::string prefix(obj_path);
    size_t slash = prefix.find_last_of('/');
    prefix = slash == std::string::npos ? "" : prefix.substr(0, slash + 1);

    std::vector<float> positions;   // 3 per vertex
    std::vector<float> normals;     // 3 per vertex
    std::vector<Mtl> materials(1);  // default material at index 0
    std::vector<Key> face_groups;

    int active_material = 0;
    char* str = data;
    while(*str)
    {
        while(isspace((unsigned char)*str)) ++str;
        char* cmd = str;
        int cmd_len = 0;
        while(*str && !isspace((unsigned char)*str)) { ++str; ++cmd_len; }
        auto is = [&](const char* name) {
            return strncmp(cmd, name, cmd_len) == 0 && (int)strlen(name) == cmd_len;
        };
        if(cmd_len == 0) break;
        if(is("v"))
        {
            positions.push_back(strtof(str, &str));
            positions.push_back(strtof(str, &str));
            positions.push_back(strtof(str, &str));
        }
        else if(is("vn"))
        {
            float x = strtof(str, &str);
            float y = strtof(str, &str);
            float z = strtof(str, &str);
            // normalize with the reference's op order (math.hh:94,106,110)
            float len = sqrtf(x * x + y * y + z * z);
            normals.push_back(x / len);
            normals.push_back(y / len);
            normals.push_back(z / len);
        }
        else if(is("f"))
        {
            for(int i = 0; i < 3; ++i)
            {
                Key k;
                k.m = active_material;
                k.p = (int)strtol(str, &str, 0) - 1;
                if(*str == '/') ++str;
                k.t = (int)strtol(str, &str, 0) - 1;
                if(*str == '/') ++str;
                k.n = (int)strtol(str, &str, 0) - 1;
                face_groups.push_back(k);
            }
        }
        else if(is("usemtl"))
        {
            std::string name = read_token(str);
            for(size_t i = 0; i < materials.size(); ++i)
            {
                if(materials[i].name == name)
                {
                    active_material = (int)i;
                    break;
                }
            }
        }
        else if(is("mtllib"))
        {
            std::string name = read_token(str);
            load_mtl(materials, (prefix + name).c_str());
        }
        skip_line(str);
    }
    free(data);

    // Bake per-material vertex attributes (reference: mesh.cc:234-253).
    std::vector<float> baked_albedo(materials.size() * 4);
    std::vector<float> baked_material(materials.size() * 4);
    for(size_t i = 0; i < materials.size(); ++i)
    {
        const Mtl& m = materials[i];
        baked_albedo[i * 4 + 0] = m.albedo[0];
        baked_albedo[i * 4 + 1] = m.albedo[1];
        baked_albedo[i * 4 + 2] = m.albedo[2];
        baked_albedo[i * 4 + 3] = m.alpha;
        float scaled[3];
        for(int c = 0; c < 3; ++c)
        {
            float denom = fmaxf(m.albedo[c], m.emission[c]);
            float v = fmaxf(m.emission[c] / denom, 0.0f);
            scaled[c] = m.emission[c] == 0 ? 0.0f : v;
        }
        baked_material[i * 4 + 0] = m.roughness;
        baked_material[i * 4 + 1] = m.metallic;
        baked_material[i * 4 + 2] =
            fmaxf(m.transmission[0], fmaxf(m.transmission[1], m.transmission[2]));
        baked_material[i * 4 + 3] = fmaxf(scaled[0], fmaxf(scaled[1], scaled[2]));
    }

    uint32_t tri_count = (uint32_t)(face_groups.size() / 3);
    out->indices = (uint32_t*)malloc(face_groups.size() * 4);
    std::unordered_map<Key, uint32_t, KeyHash> dedup;
    dedup.reserve(face_groups.size());

    std::vector<float> pos_v, nrm_v, alb_v, mat_v;
    pos_v.reserve(face_groups.size() * 3);

    size_t n_pos = positions.size() / 3;
    size_t n_nrm = normals.size() / 3;
    for(size_t i = 0; i < face_groups.size(); ++i)
    {
        const Key& k = face_groups[i];
        auto it = dedup.find(k);
        uint32_t index;
        if(it != dedup.end())
            index = it->second;
        else
        {
            index = (uint32_t)dedup.size();
            dedup.emplace(k, index);
            if(k.p >= 0 && (size_t)k.p < n_pos)
            {
                pos_v.push_back(positions[k.p * 3 + 0]);
                pos_v.push_back(positions[k.p * 3 + 1]);
                pos_v.push_back(positions[k.p * 3 + 2]);
            }
            else { pos_v.insert(pos_v.end(), {0, 0, 0}); }
            if(k.n >= 0 && (size_t)k.n < n_nrm)
            {
                nrm_v.push_back(normals[k.n * 3 + 0]);
                nrm_v.push_back(normals[k.n * 3 + 1]);
                nrm_v.push_back(normals[k.n * 3 + 2]);
            }
            else { nrm_v.insert(nrm_v.end(), {0, 0, 0}); }
            if(k.m >= 0 && (size_t)k.m < materials.size())
            {
                for(int c = 0; c < 4; ++c)
                    alb_v.push_back(baked_albedo[k.m * 4 + c]);
                for(int c = 0; c < 4; ++c)
                    mat_v.push_back(baked_material[k.m * 4 + c]);
            }
            else
            {
                alb_v.insert(alb_v.end(), {0, 0, 0, 0});
                mat_v.insert(mat_v.end(), {0, 0, 0, 0});
            }
        }
        out->indices[i] = index;
    }

    uint32_t vcount = (uint32_t)dedup.size();
    out->vertex_count = vcount;
    out->triangle_count = tri_count;
    auto dup = [](const std::vector<float>& v) {
        float* p = (float*)malloc(v.size() * 4);
        memcpy(p, v.data(), v.size() * 4);
        return p;
    };
    out->pos = dup(pos_v);
    out->normal = dup(nrm_v);
    out->albedo = dup(alb_v);
    out->material = dup(mat_v);
    return 0;
}

}  // extern "C"
