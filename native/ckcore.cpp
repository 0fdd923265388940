// ckcore: native geometry-optimization utilities for ckrenderengine_tpu.
//
// TPU-native re-implementation of the reference's CPU-side mesh tooling
// (/root/reference/src/RadixSort.cpp, MeshAdjacency.cpp, MeshStriper.cpp,
// NvStripifier.cpp, VertexCacheOptimizer.cpp, NearestPointGrid.cpp — studied
// for behavior, re-designed here: one stripifier, Forsyth linear-speed cache
// optimization, open-addressing hash grid). Exposed as a C ABI consumed via
// ctypes (ckrenderengine_tpu/utils/native.py); every entry point has a numpy
// fallback so the library is optional.
//
// Build: g++ -O2 -shared -fPIC -o libckcore.so ckcore.cpp

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <unordered_map>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Radix sort (4-pass byte histogram, returns sorted order as indices)
// ---------------------------------------------------------------------------

void ck_radix_sort_u32(const uint32_t* keys, uint32_t n, uint32_t* out_idx) {
    std::vector<uint32_t> idx(n), tmp(n);
    for (uint32_t i = 0; i < n; ++i) idx[i] = i;
    for (int pass = 0; pass < 4; ++pass) {
        uint32_t shift = pass * 8;
        uint32_t hist[256] = {0};
        for (uint32_t i = 0; i < n; ++i)
            ++hist[(keys[idx[i]] >> shift) & 0xFF];
        uint32_t sum = 0;
        uint32_t offs[256];
        for (int b = 0; b < 256; ++b) { offs[b] = sum; sum += hist[b]; }
        for (uint32_t i = 0; i < n; ++i)
            tmp[offs[(keys[idx[i]] >> shift) & 0xFF]++] = idx[i];
        idx.swap(tmp);
    }
    std::memcpy(out_idx, idx.data(), n * sizeof(uint32_t));
}

void ck_radix_sort_f32(const float* keys, uint32_t n, uint32_t* out_idx) {
    // Map float bits to sortable u32 (flip sign bit; flip all for negatives).
    std::vector<uint32_t> k(n);
    for (uint32_t i = 0; i < n; ++i) {
        uint32_t b;
        std::memcpy(&b, &keys[i], 4);
        k[i] = (b & 0x80000000u) ? ~b : (b | 0x80000000u);
    }
    ck_radix_sort_u32(k.data(), n, out_idx);
}

// ---------------------------------------------------------------------------
// Mesh adjacency: per face edge, the neighboring face (or 0xFFFFFFFF).
// Edge k of face f connects vertex k and (k+1)%3.
// ---------------------------------------------------------------------------

void ck_mesh_adjacency(const uint32_t* indices, uint32_t nfaces,
                       uint32_t* out_adj /* nfaces*3 */) {
    std::unordered_map<uint64_t, uint32_t> edge_map;   // edge -> face*3+k
    edge_map.reserve(nfaces * 3);
    for (uint32_t i = 0; i < nfaces * 3; ++i) out_adj[i] = 0xFFFFFFFFu;
    for (uint32_t f = 0; f < nfaces; ++f) {
        for (uint32_t k = 0; k < 3; ++k) {
            uint32_t a = indices[f * 3 + k];
            uint32_t b = indices[f * 3 + (k + 1) % 3];
            uint64_t key = a < b
                ? (uint64_t(a) << 32) | b
                : (uint64_t(b) << 32) | a;
            auto it = edge_map.find(key);
            if (it == edge_map.end()) {
                edge_map.emplace(key, f * 3 + k);
            } else {
                uint32_t of = it->second / 3, ok = it->second % 3;
                out_adj[f * 3 + k] = of;
                out_adj[of * 3 + ok] = f;
                edge_map.erase(it);    // non-manifold: first pair wins
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Triangle stripifier: greedy strip growth over adjacency, seeds sorted by
// face degree (fewest neighbors first). Output: concatenated strips with
// lengths; caller converts to one connected strip with degenerates if wanted.
// Returns total index count written; strip count in *out_nstrips.
// ---------------------------------------------------------------------------

static inline uint32_t third_vertex(const uint32_t* tri, uint32_t a, uint32_t b) {
    for (int k = 0; k < 3; ++k)
        if (tri[k] != a && tri[k] != b) return tri[k];
    return tri[0];
}

static inline bool face_has_edge(const uint32_t* tri, uint32_t a, uint32_t b) {
    // directed check not needed; membership of both vertices
    bool ha = tri[0] == a || tri[1] == a || tri[2] == a;
    bool hb = tri[0] == b || tri[1] == b || tri[2] == b;
    return ha && hb;
}

uint32_t ck_stripify(const uint32_t* indices, uint32_t nfaces,
                     uint32_t* out_indices /* cap 4*nfaces+16 */,
                     uint32_t* out_strip_lengths /* cap nfaces */,
                     uint32_t* out_nstrips) {
    if (nfaces == 0) { *out_nstrips = 0; return 0; }
    std::vector<uint32_t> adj(nfaces * 3);
    ck_mesh_adjacency(indices, nfaces, adj.data());

    // degree = neighbor count; seeds from low degree (boundary first)
    std::vector<uint32_t> degree(nfaces, 0);
    for (uint32_t f = 0; f < nfaces; ++f)
        for (int k = 0; k < 3; ++k)
            if (adj[f * 3 + k] != 0xFFFFFFFFu) ++degree[f];
    std::vector<uint32_t> seeds(nfaces);
    for (uint32_t i = 0; i < nfaces; ++i) seeds[i] = i;
    std::stable_sort(seeds.begin(), seeds.end(),
                     [&](uint32_t a, uint32_t b) { return degree[a] < degree[b]; });

    std::vector<uint8_t> used(nfaces, 0);
    uint32_t written = 0, nstrips = 0;

    for (uint32_t si = 0; si < nfaces; ++si) {
        uint32_t f = seeds[si];
        if (used[f]) continue;
        // start a strip with face f; choose the edge leading to an unused
        // neighbor if any
        uint32_t v0 = indices[f * 3 + 0], v1 = indices[f * 3 + 1],
                 v2 = indices[f * 3 + 2];
        // pick rotation so that the edge (v1,v2) has an unused neighbor
        for (int rot = 0; rot < 3; ++rot) {
            uint32_t nb = adj[f * 3 + (rot + 1) % 3];  // edge (k+1): v1-v2 side
            uint32_t a = indices[f * 3 + rot];
            uint32_t b = indices[f * 3 + (rot + 1) % 3];
            uint32_t c = indices[f * 3 + (rot + 2) % 3];
            if (nb != 0xFFFFFFFFu && !used[nb]) { v0 = a; v1 = b; v2 = c; break; }
            v0 = a; v1 = b; v2 = c;
        }
        used[f] = 1;
        uint32_t strip_start = written;
        out_indices[written++] = v0;
        out_indices[written++] = v1;
        out_indices[written++] = v2;
        // grow: current edge is (v1, v2) with parity so the next face
        // attaches across it
        uint32_t cur = f, ea = v1, eb = v2;
        for (;;) {
            uint32_t next = 0xFFFFFFFFu;
            for (int k = 0; k < 3; ++k) {
                uint32_t nb = adj[cur * 3 + k];
                if (nb != 0xFFFFFFFFu && !used[nb]
                    && face_has_edge(&indices[nb * 3], ea, eb)) {
                    next = nb;
                    break;
                }
            }
            if (next == 0xFFFFFFFFu) break;
            uint32_t nv = third_vertex(&indices[next * 3], ea, eb);
            out_indices[written++] = nv;
            used[next] = 1;
            cur = next;
            ea = eb;           // strip parity: new edge = (old eb, new vertex)
            eb = nv;
        }
        out_strip_lengths[nstrips++] = written - strip_start;
    }
    *out_nstrips = nstrips;
    return written;
}

// ---------------------------------------------------------------------------
// NVIDIA-style stripifier (distinct from ck_stripify's greedy walker; the
// reference ships two different algorithms, src/MeshStriper.cpp vs
// src/NvStripifier.cpp — studied for structure, re-implemented here):
// repeat { sample up to `samples` unused seed faces; for each seed try all
// 3 edge orientations, growing a strip BOTH directions from the seed edge;
// commit only the longest candidate }. Longer strips -> fewer strips than
// one greedy pass, at the cost of re-growing candidates.
// ---------------------------------------------------------------------------

static uint32_t nv_grow(const uint32_t* indices, const uint32_t* adj,
                        const uint8_t* used, uint32_t* mark, uint32_t epoch,
                        uint32_t cur, uint32_t ea, uint32_t eb,
                        uint32_t* out_verts) {
    // Walk across edge (ea,eb) appending third vertices; faces visited in
    // THIS candidate are epoch-marked so closed rings terminate.
    uint32_t count = 0;
    for (;;) {
        uint32_t next = 0xFFFFFFFFu;
        for (int k = 0; k < 3; ++k) {
            uint32_t nb = adj[cur * 3 + k];
            if (nb != 0xFFFFFFFFu && !used[nb] && mark[nb] != epoch
                && face_has_edge(&indices[nb * 3], ea, eb)) {
                next = nb;
                break;
            }
        }
        if (next == 0xFFFFFFFFu) break;
        uint32_t nv = third_vertex(&indices[next * 3], ea, eb);
        out_verts[count++] = nv;
        mark[next] = epoch;
        cur = next;
        ea = eb;
        eb = nv;
    }
    return count;
}

uint32_t ck_nvstripify(const uint32_t* indices, uint32_t nfaces,
                       uint32_t samples,
                       uint32_t* out_indices /* cap 4*nfaces+16 */,
                       uint32_t* out_strip_lengths /* cap nfaces */,
                       uint32_t* out_nstrips) {
    *out_nstrips = 0;
    if (nfaces == 0) return 0;
    if (samples == 0) samples = 1;
    std::vector<uint32_t> adj(nfaces * 3);
    ck_mesh_adjacency(indices, nfaces, adj.data());

    // Seed preference: low-degree (boundary) faces first, like the strip
    // tracker; the sampler scans this order for unused faces.
    std::vector<uint32_t> degree(nfaces, 0);
    for (uint32_t f = 0; f < nfaces; ++f)
        for (int k = 0; k < 3; ++k)
            if (adj[f * 3 + k] != 0xFFFFFFFFu) ++degree[f];
    std::vector<uint32_t> seeds(nfaces);
    for (uint32_t i = 0; i < nfaces; ++i) seeds[i] = i;
    std::stable_sort(seeds.begin(), seeds.end(),
                     [&](uint32_t a, uint32_t b) { return degree[a] < degree[b]; });

    std::vector<uint8_t> used(nfaces, 0);
    std::vector<uint32_t> mark(nfaces, 0);
    std::vector<uint32_t> fwd(nfaces + 3), back(nfaces + 3);
    uint32_t epoch = 0, scan = 0, remaining = nfaces;
    uint32_t written = 0, nstrips = 0;

    while (remaining > 0) {
        // candidate search over up to `samples` unused seeds x 3 rotations
        uint32_t best_faces = 0, best_seed = 0xFFFFFFFFu, best_rot = 0;
        uint32_t found = 0;
        while (scan < nfaces && used[seeds[scan]]) ++scan;
        for (uint32_t s = scan; s < nfaces && found < samples; ++s) {
            uint32_t f = seeds[s];
            if (used[f]) continue;
            ++found;
            for (uint32_t rot = 0; rot < 3; ++rot) {
                uint32_t v0 = indices[f * 3 + rot];
                uint32_t v1 = indices[f * 3 + (rot + 1) % 3];
                uint32_t v2 = indices[f * 3 + (rot + 2) % 3];
                ++epoch;
                mark[f] = epoch;
                uint32_t nf = nv_grow(indices, adj.data(), used.data(),
                                      mark.data(), epoch, f, v1, v2, fwd.data());
                uint32_t nb = nv_grow(indices, adj.data(), used.data(),
                                      mark.data(), epoch, f, v1, v0, back.data());
                uint32_t total = 1 + nf + nb;
                if (total > best_faces) {
                    best_faces = total;
                    best_seed = f;
                    best_rot = rot;
                }
            }
        }
        if (best_seed == 0xFFFFFFFFu) break;   // defensive; cannot happen

        // regrow the winner (deterministic given unchanged `used`) + commit
        uint32_t f = best_seed;
        uint32_t v0 = indices[f * 3 + best_rot];
        uint32_t v1 = indices[f * 3 + (best_rot + 1) % 3];
        uint32_t v2 = indices[f * 3 + (best_rot + 2) % 3];
        ++epoch;
        mark[f] = epoch;
        uint32_t nf = nv_grow(indices, adj.data(), used.data(), mark.data(),
                              epoch, f, v1, v2, fwd.data());
        uint32_t nb = nv_grow(indices, adj.data(), used.data(), mark.data(),
                              epoch, f, v1, v0, back.data());
        for (uint32_t i = 0; i < nfaces; ++i)
            if (mark[i] == epoch) { used[i] = 1; }
        remaining -= 1 + nf + nb;

        // emit: reverse(back) + v0 v1 v2 + fwd; odd back count flips strip
        // parity, fixed with one leading degenerate duplicate.
        uint32_t strip_start = written;
        if (nb % 2 == 1)
            out_indices[written++] = back[nb - 1];
        for (uint32_t i = 0; i < nb; ++i)
            out_indices[written++] = back[nb - 1 - i];
        out_indices[written++] = v0;
        out_indices[written++] = v1;
        out_indices[written++] = v2;
        for (uint32_t i = 0; i < nf; ++i)
            out_indices[written++] = fwd[i];
        out_strip_lengths[nstrips++] = written - strip_start;
    }
    *out_nstrips = nstrips;
    return written;
}

// ---------------------------------------------------------------------------
// Vertex-cache optimization (Forsyth 2006 linear-speed algorithm).
// Reorders faces; writes new face order (indices into the original faces).
// ---------------------------------------------------------------------------

void ck_vertex_cache_optimize(const uint32_t* indices, uint32_t nfaces,
                              uint32_t nverts, uint32_t cache_size,
                              uint32_t* out_face_order) {
    if (nfaces == 0) return;
    if (cache_size < 4) cache_size = 4;
    const float FindVertexScore_CacheDecayPower = 1.5f;
    const float LastTriScore = 0.75f;
    const float ValenceBoostScale = 2.0f;
    const float ValenceBoostPower = 0.5f;

    std::vector<uint32_t> remaining(nverts, 0);
    for (uint32_t i = 0; i < nfaces * 3; ++i) ++remaining[indices[i]];

    // per-vertex face lists
    std::vector<uint32_t> face_list_off(nverts + 1, 0);
    for (uint32_t i = 0; i < nfaces * 3; ++i) ++face_list_off[indices[i] + 1];
    for (uint32_t v = 0; v < nverts; ++v) face_list_off[v + 1] += face_list_off[v];
    std::vector<uint32_t> face_list(nfaces * 3);
    {
        std::vector<uint32_t> cursor(face_list_off.begin(), face_list_off.end() - 1);
        for (uint32_t f = 0; f < nfaces; ++f)
            for (int k = 0; k < 3; ++k)
                face_list[cursor[indices[f * 3 + k]]++] = f;
    }

    std::vector<int32_t> cache_pos(nverts, -1);
    std::vector<float> vscore(nverts, 0.0f);
    std::vector<uint8_t> emitted(nfaces, 0);
    std::vector<float> fscore(nfaces, 0.0f);

    auto vertex_score = [&](uint32_t v) -> float {
        if (remaining[v] == 0) return -1.0f;
        float score = 0.0f;
        int32_t cp = cache_pos[v];
        if (cp >= 0) {
            if (cp < 3) score = LastTriScore;
            else {
                float s = 1.0f - float(cp - 3) / float(cache_size - 3);
                score = std::pow(s, FindVertexScore_CacheDecayPower);
            }
        }
        score += ValenceBoostScale *
                 std::pow(float(remaining[v]), -ValenceBoostPower);
        return score;
    };

    for (uint32_t v = 0; v < nverts; ++v) vscore[v] = vertex_score(v);
    for (uint32_t f = 0; f < nfaces; ++f)
        fscore[f] = vscore[indices[f * 3]] + vscore[indices[f * 3 + 1]]
                  + vscore[indices[f * 3 + 2]];

    std::vector<uint32_t> cache;   // LRU front = most recent
    cache.reserve(cache_size + 3);

    uint32_t out_count = 0;
    int64_t best_face = -1;
    for (;;) {
        if (best_face < 0) {
            float best = -1e30f;
            for (uint32_t f = 0; f < nfaces; ++f)
                if (!emitted[f] && fscore[f] > best) { best = fscore[f]; best_face = f; }
            if (best_face < 0) break;
        }
        uint32_t f = uint32_t(best_face);
        emitted[f] = 1;
        out_face_order[out_count++] = f;

        for (int k = 0; k < 3; ++k) {
            uint32_t v = indices[f * 3 + k];
            if (remaining[v] > 0) --remaining[v];
            // move to cache front
            auto it = std::find(cache.begin(), cache.end(), v);
            if (it != cache.end()) cache.erase(it);
            cache.insert(cache.begin(), v);
        }
        // trim cache; vertices pushed out lose their position
        while (cache.size() > cache_size) {
            cache_pos[cache.back()] = -1;
            cache.pop_back();
        }
        for (uint32_t i = 0; i < cache.size(); ++i) cache_pos[cache[i]] = int32_t(i);

        // rescore cache vertices + their faces; pick next best among them
        best_face = -1;
        float best = -1e30f;
        for (uint32_t i = 0; i < cache.size(); ++i) {
            uint32_t v = cache[i];
            vscore[v] = vertex_score(v);
        }
        for (uint32_t i = 0; i < cache.size(); ++i) {
            uint32_t v = cache[i];
            for (uint32_t j = face_list_off[v]; j < face_list_off[v + 1]; ++j) {
                uint32_t nf = face_list[j];
                if (emitted[nf]) continue;
                float s = vscore[indices[nf * 3]] + vscore[indices[nf * 3 + 1]]
                        + vscore[indices[nf * 3 + 2]];
                fscore[nf] = s;
                if (s > best) { best = s; best_face = nf; }
            }
        }
        if (out_count == nfaces) break;
    }
    // any unreached faces (isolated) appended in order
    for (uint32_t f = 0; f < nfaces && out_count < nfaces; ++f)
        if (!emitted[f]) { emitted[f] = 1; out_face_order[out_count++] = f; }
}

// Simulated post-T&L cache miss count (FIFO cache, the reference's
// VertexCache model, include/VertexCache.h).
uint32_t ck_cache_misses(const uint32_t* indices, uint32_t n,
                         uint32_t cache_size) {
    std::vector<uint32_t> fifo;
    uint32_t misses = 0;
    for (uint32_t i = 0; i < n; ++i) {
        uint32_t v = indices[i];
        if (std::find(fifo.begin(), fifo.end(), v) == fifo.end()) {
            ++misses;
            fifo.insert(fifo.begin(), v);
            if (fifo.size() > cache_size) fifo.pop_back();
        }
    }
    return misses;
}

// ---------------------------------------------------------------------------
// Nearest-point grid: uniform hash grid for nearest-within-threshold queries.
// Stateless batch API: build once per call set via opaque handle.
// ---------------------------------------------------------------------------

struct NPGrid {
    float cell;
    std::vector<float> pts;            // n*3
    std::unordered_map<uint64_t, std::vector<uint32_t>> cells;
    uint64_t key(int64_t x, int64_t y, int64_t z) const {
        return (uint64_t(uint32_t(x)) * 73856093u)
             ^ (uint64_t(uint32_t(y)) * 19349663u)
             ^ (uint64_t(uint32_t(z)) * 83492791u);
    }
};

void* ck_npgrid_build(const float* points, uint32_t n, float cell) {
    NPGrid* g = new NPGrid();
    g->cell = cell > 1e-12f ? cell : 1.0f;
    g->pts.assign(points, points + size_t(n) * 3);
    for (uint32_t i = 0; i < n; ++i) {
        int64_t cx = int64_t(std::floor(points[i * 3 + 0] / g->cell));
        int64_t cy = int64_t(std::floor(points[i * 3 + 1] / g->cell));
        int64_t cz = int64_t(std::floor(points[i * 3 + 2] / g->cell));
        g->cells[g->key(cx, cy, cz)].push_back(i);
    }
    return g;
}

// Returns index of nearest point within threshold, or 0xFFFFFFFF.
uint32_t ck_npgrid_nearest(void* handle, float x, float y, float z,
                           float threshold) {
    NPGrid* g = static_cast<NPGrid*>(handle);
    float best_d2 = threshold * threshold;
    uint32_t best = 0xFFFFFFFFu;
    int64_t r = int64_t(std::ceil(threshold / g->cell));
    int64_t cx = int64_t(std::floor(x / g->cell));
    int64_t cy = int64_t(std::floor(y / g->cell));
    int64_t cz = int64_t(std::floor(z / g->cell));
    for (int64_t dx = -r; dx <= r; ++dx)
        for (int64_t dy = -r; dy <= r; ++dy)
            for (int64_t dz = -r; dz <= r; ++dz) {
                auto it = g->cells.find(g->key(cx + dx, cy + dy, cz + dz));
                if (it == g->cells.end()) continue;
                for (uint32_t i : it->second) {
                    float ddx = g->pts[i * 3 + 0] - x;
                    float ddy = g->pts[i * 3 + 1] - y;
                    float ddz = g->pts[i * 3 + 2] - z;
                    float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                    if (d2 <= best_d2) { best_d2 = d2; best = i; }
                }
            }
    return best;
}

void ck_npgrid_free(void* handle) {
    delete static_cast<NPGrid*>(handle);
}

}  // extern "C"
