// Sanitizer harness for the native BVH builder (accel/native/bvh_builder.cc).
//
// The reference ships no sanitizer targets (SURVEY.md section 5: `-g` in
// CFLAGS but no TSan/ASan builds); our host-side native code gets one here.
// Compile this file together with bvh_builder.cc under
// -fsanitize=address,undefined and run it: any heap overrun, use-after-free,
// or UB in the SAH build / BFS flatten / octant-link emission aborts with a
// nonzero exit. tests/test_native_sanitizer.py drives it.
//
// Exercises: degenerate inputs (n=0, n=1), flat/colinear leaf clouds (SAH
// tie-breaking), a large random cloud, duplicate AABBs, and the cap=-1
// too-small-buffer path.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" int64_t pt_build_bvh(
    const float* leaf_min, const float* leaf_max, const uint32_t* leaf_idx,
    uint32_t n, float* out_nodes, uint32_t* out_links, uint32_t cap);

static uint32_t rng_state = 0x9E3779B9u;
static float frand()
{
    rng_state = rng_state * 1664525u + 1013904223u;
    return (float)(rng_state >> 8) / (float)(1u << 24);
}

static int build_and_check(const std::vector<float>& mn,
                           const std::vector<float>& mx, uint32_t n)
{
    std::vector<uint32_t> idx(n);
    for (uint32_t i = 0; i < n; ++i) idx[i] = i;
    // exact-size buffers so ASan catches any out-of-bounds write
    uint32_t cap = 2 * n + 8;
    std::vector<float> nodes((size_t)cap * 6);
    std::vector<uint32_t> links((size_t)8 * cap * 2);
    int64_t count = pt_build_bvh(mn.data(), mx.data(), idx.data(), n,
                                 nodes.data(), links.data(), cap);
    if (count < 0 || (uint64_t)count > cap) {
        std::fprintf(stderr, "bad node count %lld for n=%u\n",
                     (long long)count, n);
        return 1;
    }
    // every link must be a valid node id, a leaf payload, or the sentinel
    for (int64_t i = 0; i < 8 * count * 2; ++i) {
        uint32_t l = links[(size_t)i];
        if (l == 0xFFFFFFFFu) continue;
        if (l & 0x80000000u) {
            if ((l & 0x7FFFFFFFu) >= n) {
                std::fprintf(stderr, "leaf payload out of range\n");
                return 1;
            }
        } else if (l >= (uint32_t)count) {
            std::fprintf(stderr, "link to nonexistent node\n");
            return 1;
        }
    }
    return 0;
}

int main()
{
    int rc = 0;

    // n = 0 and n = 1
    {
        std::vector<float> z;
        std::vector<uint32_t> zi;
        float nodes[6];
        uint32_t links[16];
        if (pt_build_bvh(z.data(), z.data(), zi.data(), 0, nodes, links, 1)
            != 0)
            rc |= 1;
    }
    {
        std::vector<float> mn = {0, 0, 0}, mx = {1, 1, 1};
        rc |= build_and_check(mn, mx, 1);
    }

    // colinear leaves (every centroid on the x axis: SAH ties on y/z)
    {
        uint32_t n = 64;
        std::vector<float> mn(n * 3), mx(n * 3);
        for (uint32_t i = 0; i < n; ++i) {
            mn[i * 3] = (float)i;     mx[i * 3] = (float)i + 1;
            mn[i * 3 + 1] = 0;        mx[i * 3 + 1] = 1;
            mn[i * 3 + 2] = 0;        mx[i * 3 + 2] = 1;
        }
        rc |= build_and_check(mn, mx, n);
    }

    // all-identical AABBs (fully degenerate: every sort is a tie)
    {
        uint32_t n = 33;
        std::vector<float> mn(n * 3, 2.0f), mx(n * 3, 3.0f);
        rc |= build_and_check(mn, mx, n);
    }

    // large random cloud
    {
        uint32_t n = 5000;
        std::vector<float> mn(n * 3), mx(n * 3);
        for (uint32_t i = 0; i < n * 3; ++i) {
            float a = frand() * 100.0f, b = frand() * 2.0f;
            mn[i] = a;
            mx[i] = a + b;
        }
        rc |= build_and_check(mn, mx, n);
    }

    // cap-too-small must return -1, not write out of bounds
    {
        uint32_t n = 256;
        std::vector<float> mn(n * 3), mx(n * 3);
        std::vector<uint32_t> idx(n);
        for (uint32_t i = 0; i < n; ++i) {
            idx[i] = i;
            mn[i * 3] = (float)(i % 17);
            mn[i * 3 + 1] = (float)(i % 5);
            mn[i * 3 + 2] = (float)(i % 3);
            mx[i * 3] = mn[i * 3] + 1;
            mx[i * 3 + 1] = mn[i * 3 + 1] + 1;
            mx[i * 3 + 2] = mn[i * 3 + 2] + 1;
        }
        uint32_t cap = 4;  // far too small for 256 leaves
        std::vector<float> nodes((size_t)cap * 6);
        std::vector<uint32_t> links((size_t)8 * cap * 2);
        if (pt_build_bvh(mn.data(), mx.data(), idx.data(), n, nodes.data(),
                         links.data(), cap) != -1) {
            std::fprintf(stderr, "cap overflow not detected\n");
            rc |= 1;
        }
    }

    if (rc == 0) std::puts("native_sanity: all clean");
    return rc;
}
