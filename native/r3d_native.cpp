// Native host-side runtime kernels for regard3d_tpu.
//
// The reference keeps its host runtime in C++ (union-find tracks builder via
// OpenMVG, binary feature stores, src/threads/*); these are the equivalents
// for the hot host-side paths that do not map onto the TPU:
//
//  * r3d_union_find       — path-compressed, union-by-size connected
//                           components over a match-graph edge list
//                           (tracks builder core; pointer-chasing beats
//                           vectorized label propagation at 1DSfM scale)
//  * r3d_parse_feats      — fast parser for .feat text files
//                           ("x y scale orientation" per line)
//  * r3d_count_components / r3d_compact_labels — label utilities
//
// Exposed with a C ABI for ctypes (no pybind11 in this environment).
// Build: native/build.sh  ->  libr3d_native.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Union-find
// ---------------------------------------------------------------------------

struct UF {
    int64_t* parent;
    int64_t* size;
};

static int64_t uf_find(UF& uf, int64_t x) {
    int64_t root = x;
    while (uf.parent[root] != root) root = uf.parent[root];
    while (uf.parent[x] != root) {   // path compression
        int64_t next = uf.parent[x];
        uf.parent[x] = root;
        x = next;
    }
    return root;
}

// edges: (2*num_edges) int64 pairs (a, b); labels out: (num_nodes,)
// Returns the number of connected components.
int64_t r3d_union_find(const int64_t* edges, int64_t num_edges,
                       int64_t num_nodes, int64_t* labels_out) {
    UF uf;
    uf.parent = (int64_t*)malloc(sizeof(int64_t) * num_nodes);
    uf.size = (int64_t*)malloc(sizeof(int64_t) * num_nodes);
    if (!uf.parent || !uf.size) {
        free(uf.parent);
        free(uf.size);
        return -1;
    }
    for (int64_t i = 0; i < num_nodes; ++i) {
        uf.parent[i] = i;
        uf.size[i] = 1;
    }
    for (int64_t e = 0; e < num_edges; ++e) {
        int64_t a = edges[2 * e];
        int64_t b = edges[2 * e + 1];
        if (a < 0 || a >= num_nodes || b < 0 || b >= num_nodes) continue;
        int64_t ra = uf_find(uf, a);
        int64_t rb = uf_find(uf, b);
        if (ra == rb) continue;
        if (uf.size[ra] < uf.size[rb]) { int64_t t = ra; ra = rb; rb = t; }
        uf.parent[rb] = ra;
        uf.size[ra] += uf.size[rb];
    }
    // canonical label: root id, then compact to dense 0..k-1 preserving
    // first-appearance order
    int64_t ncomp = 0;
    // reuse size[] as the root->dense map, marked with -1
    for (int64_t i = 0; i < num_nodes; ++i) uf.size[i] = -1;
    for (int64_t i = 0; i < num_nodes; ++i) {
        int64_t r = uf_find(uf, i);
        if (uf.size[r] < 0) uf.size[r] = ncomp++;
        labels_out[i] = uf.size[r];
    }
    free(uf.parent);
    free(uf.size);
    return ncomp;
}

// ---------------------------------------------------------------------------
// .feat text parser: "x y scale orientation" per line
// ---------------------------------------------------------------------------

// Parses up to max_rows keypoints into out (max_rows*4 floats).
// Returns number of rows parsed, or -1 on I/O error.
int64_t r3d_parse_feats(const char* path, float* out, int64_t max_rows) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long len = ftell(f);
    fseek(f, 0, SEEK_SET);
    char* buf = (char*)malloc(len + 1);
    if (!buf) { fclose(f); return -1; }
    size_t got = fread(buf, 1, len, f);
    fclose(f);
    buf[got] = 0;

    int64_t rows = 0;
    char* p = buf;
    char* end = buf + got;
    while (p < end && rows < max_rows) {
        // skip whitespace/newlines
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' ||
                           *p == '\t')) ++p;
        if (p >= end) break;
        char* q = p;
        float v[4];
        int k = 0;
        for (; k < 4; ++k) {
            v[k] = strtof(q, &q);
            if (q == p) break;
            p = q;
        }
        if (k < 4) break;  // malformed tail
        float* dst = out + rows * 4;
        dst[0] = v[0]; dst[1] = v[1]; dst[2] = v[2]; dst[3] = v[3];
        ++rows;
    }
    free(buf);
    return rows;
}

// ---------------------------------------------------------------------------
// misc
// ---------------------------------------------------------------------------

const char* r3d_native_version() { return "r3d_native 0.1.0"; }

}  // extern "C"
