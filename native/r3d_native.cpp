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

}  // extern "C"

// ---------------------------------------------------------------------------
// Max-tree (union-find on level-sorted pixels) + MSER / TBMR extraction.
//
// The reference reaches MSER through cv::MSER::create() defaults
// (src/Regard3DFeatures.cpp:652-662) and TBMR through OpenMVG's
// features::tbmr::Extract_tbmr (src/Regard3DFeatures.cpp:618-639). Both are
// component-tree algorithms over the grayscale threshold decomposition —
// inherently sequential pointer-chasing, so they live in the native host
// runtime (the detected keypoints are re-described on-device with LIOP).
//
// Tree construction: Berger/Najman union-find over pixels sorted by gray
// level (counting sort, 4-connectivity), followed by canonicalization.
// For a max-tree (bright components) pixels are processed brightest-first;
// the min-tree is the max-tree of the inverted image.
// ---------------------------------------------------------------------------

namespace {

struct MaxTree {
    int64_t n = 0, w = 0, h = 0;
    const uint8_t* val = nullptr;
    int64_t* parent = nullptr;    // pixel -> pixel (canonical after pass 2)
    int64_t* order = nullptr;     // processing order (root first)
    // per-pixel accumulated component stats (valid at canonical pixels)
    double* area = nullptr;
    double* sx = nullptr;         // sum x
    double* sy = nullptr;
    double* sxx = nullptr;
    double* syy = nullptr;
    double* sxy = nullptr;
    int32_t* bb = nullptr;        // bounding boxes: 4 per pixel (x0,y0,x1,y1)

    bool alloc(int64_t n_) {
        n = n_;
        parent = (int64_t*)malloc(sizeof(int64_t) * n);
        order = (int64_t*)malloc(sizeof(int64_t) * n);
        area = (double*)malloc(sizeof(double) * n);
        sx = (double*)malloc(sizeof(double) * n);
        sy = (double*)malloc(sizeof(double) * n);
        sxx = (double*)malloc(sizeof(double) * n);
        syy = (double*)malloc(sizeof(double) * n);
        sxy = (double*)malloc(sizeof(double) * n);
        bb = (int32_t*)malloc(sizeof(int32_t) * 4 * n);
        return parent && order && area && sx && sy && sxx && syy && sxy && bb;
    }
    void release() {
        free(parent); free(order); free(area); free(sx); free(sy);
        free(sxx); free(syy); free(sxy); free(bb);
    }
    bool is_canonical(int64_t p) const {
        return parent[p] == p || val[parent[p]] != val[p];
    }
};

static int64_t mt_find(int64_t* zpar, int64_t x) {
    int64_t root = x;
    while (zpar[root] != root) root = zpar[root];
    while (zpar[x] != root) { int64_t nx = zpar[x]; zpar[x] = root; x = nx; }
    return root;
}

// Build the max-tree of `img` (brightest components = leaves). Returns false
// on allocation failure. Caller must release().
static bool build_max_tree(const uint8_t* img, int64_t w, int64_t h,
                           MaxTree& t) {
    const int64_t n = w * h;
    t.w = w; t.h = h; t.val = img;
    if (!t.alloc(n)) return false;
    int64_t* zpar = (int64_t*)malloc(sizeof(int64_t) * n);
    uint8_t* seen = (uint8_t*)calloc(n, 1);
    if (!zpar || !seen) { free(zpar); free(seen); return false; }

    // counting sort: brightest first
    int64_t hist[257] = {0};
    for (int64_t i = 0; i < n; ++i) hist[255 - img[i] + 1]++;
    for (int k = 1; k <= 256; ++k) hist[k] += hist[k - 1];
    for (int64_t i = 0; i < n; ++i) t.order[hist[255 - img[i]]++] = i;

    for (int64_t k = 0; k < n; ++k) {
        const int64_t p = t.order[k];
        t.parent[p] = p; zpar[p] = p; seen[p] = 1;
        const int64_t px = p % w, py = p / w;
        t.area[p] = 1.0;
        t.sx[p] = (double)px; t.sy[p] = (double)py;
        t.sxx[p] = (double)px * px; t.syy[p] = (double)py * py;
        t.sxy[p] = (double)px * py;
        t.bb[4 * p + 0] = (int32_t)px; t.bb[4 * p + 1] = (int32_t)py;
        t.bb[4 * p + 2] = (int32_t)px; t.bb[4 * p + 3] = (int32_t)py;
        const int64_t neigh[4] = {
            px > 0 ? p - 1 : -1, px + 1 < w ? p + 1 : -1,
            py > 0 ? p - w : -1, py + 1 < h ? p + w : -1};
        for (int d = 0; d < 4; ++d) {
            const int64_t q = neigh[d];
            if (q < 0 || !seen[q]) continue;
            const int64_t r = mt_find(zpar, q);
            if (r == p) continue;
            t.parent[r] = p; zpar[r] = p;
            t.area[p] += t.area[r];
            t.sx[p] += t.sx[r]; t.sy[p] += t.sy[r];
            t.sxx[p] += t.sxx[r]; t.syy[p] += t.syy[r];
            t.sxy[p] += t.sxy[r];
            if (t.bb[4 * r + 0] < t.bb[4 * p + 0]) t.bb[4 * p + 0] = t.bb[4 * r + 0];
            if (t.bb[4 * r + 1] < t.bb[4 * p + 1]) t.bb[4 * p + 1] = t.bb[4 * r + 1];
            if (t.bb[4 * r + 2] > t.bb[4 * p + 2]) t.bb[4 * p + 2] = t.bb[4 * r + 2];
            if (t.bb[4 * r + 3] > t.bb[4 * p + 3]) t.bb[4 * p + 3] = t.bb[4 * r + 3];
        }
    }
    // canonicalize: every pixel points to the canonical element of its node.
    // Must run root-first; the root is the darkest pixel = processed LAST,
    // so traverse the insertion order in reverse.
    for (int64_t k = n - 1; k >= 0; --k) {
        const int64_t p = t.order[k];
        const int64_t q = t.parent[p];
        if (img[t.parent[q]] == img[q]) t.parent[p] = t.parent[q];
    }
    free(zpar); free(seen);
    return true;
}

}  // namespace

// MSER over one tree polarity. img: (h*w) u8; out rows of 4 floats
// (cx, cy, kp_size, area) where kp_size = (bbox_w + bbox_h)/2 — the
// cv::KeyPoint conversion cv::MSER::detect applies to detected regions.
// Stability: VLFeat-style — variation vs the ancestor `delta` levels away,
// local minimum along the path, thresholds per cv::MSER::create() defaults.
static int64_t mser_one_polarity(const uint8_t* img, int64_t w, int64_t h,
                                 int delta, int64_t min_area,
                                 int64_t max_area, double max_variation,
                                 double min_diversity, float* out,
                                 int64_t max_out, int64_t written) {
    MaxTree t;
    if (!build_max_tree(img, w, h, t)) return -1;
    const int64_t n = w * h;

    double* var = (double*)malloc(sizeof(double) * n);
    uint8_t* stable = (uint8_t*)calloc(n, 1);
    double* child_min_var = (double*)malloc(sizeof(double) * n);
    if (!var || !stable || !child_min_var) {
        free(var); free(stable); free(child_min_var);
        t.release();
        return -1;
    }
    for (int64_t i = 0; i < n; ++i) child_min_var[i] = 1e30;

    // variation per canonical node: (area(anc at level -/+ delta) - area)/area
    for (int64_t k = 0; k < n; ++k) {
        const int64_t p = t.order[k];
        if (!t.is_canonical(p)) { var[p] = 1e30; continue; }
        const int lv = (int)t.val[p];
        // component at threshold (lv - delta): node a whose level range
        // (level(parent(a)), level(a)] contains lv - delta
        int64_t a = p;
        while (t.parent[a] != a && (int)t.val[t.parent[a]] >= lv - delta)
            a = t.parent[a];
        var[p] = (t.area[a] - t.area[p]) / t.area[p];
    }
    // local-minimum test: node var must not exceed parent's or any child's
    for (int64_t k = n - 1; k >= 0; --k) {   // leaves first
        const int64_t p = t.order[k];
        if (!t.is_canonical(p)) continue;
        int64_t q = t.parent[p];
        if (q != p) {
            q = t.is_canonical(q) ? q : t.parent[q];
            if (var[p] < child_min_var[q]) child_min_var[q] = var[p];
        }
    }
    for (int64_t k = 0; k < n; ++k) {
        const int64_t p = t.order[k];
        if (!t.is_canonical(p)) continue;
        const int64_t a = (int64_t)t.area[p];
        if (a < min_area || a > max_area || var[p] > max_variation) continue;
        int64_t q = t.parent[p];
        q = (q == p || t.is_canonical(q)) ? q : t.parent[q];
        const double parent_var = (q == p) ? 1e30 : var[q];
        if (var[p] <= parent_var && var[p] <= child_min_var[p])
            stable[p] = 1;
    }
    // diversity pruning: drop a stable node whose nearest stable ancestor is
    // too similar in area
    for (int64_t k = 0; k < n; ++k) {
        const int64_t p = t.order[k];
        if (!stable[p]) continue;
        int64_t a = t.parent[p];
        while (a != t.parent[a] && !stable[a]) a = t.parent[a];
        if (stable[a] && a != p) {
            const double div = (t.area[a] - t.area[p]) / t.area[a];
            if (div < min_diversity) stable[p] = 0;
        }
    }
    for (int64_t k = 0; k < n && written < max_out; ++k) {
        const int64_t p = t.order[k];
        if (!stable[p]) continue;
        const double bw = t.bb[4 * p + 2] - t.bb[4 * p + 0] + 1;
        const double bh = t.bb[4 * p + 3] - t.bb[4 * p + 1] + 1;
        float* row = out + 4 * written;
        row[0] = (float)(0.5 * (t.bb[4 * p + 0] + t.bb[4 * p + 2]));
        row[1] = (float)(0.5 * (t.bb[4 * p + 1] + t.bb[4 * p + 3]));
        row[2] = (float)(0.5 * (bw + bh));
        row[3] = (float)t.area[p];
        ++written;
    }
    free(var); free(stable); free(child_min_var);
    t.release();
    return written;
}

extern "C" {

// MSER keypoints over both polarities (cv::MSER handles bright and dark
// regions). Parameters default to cv::MSER::create(): delta=5, min_area=60,
// max_area=14400, max_variation=0.25, min_diversity=0.2.
// out: rows of 4 floats (cx, cy, kp_size, area). Returns count or -1.
int64_t r3d_mser(const uint8_t* img, int64_t w, int64_t h, int32_t delta,
                 int64_t min_area, int64_t max_area, double max_variation,
                 double min_diversity, float* out, int64_t max_out) {
    int64_t written = mser_one_polarity(img, w, h, delta, min_area, max_area,
                                        max_variation, min_diversity, out,
                                        max_out, 0);
    if (written < 0) return -1;
    uint8_t* inv = (uint8_t*)malloc(w * h);
    if (!inv) return -1;
    for (int64_t i = 0; i < w * h; ++i) inv[i] = 255 - img[i];
    written = mser_one_polarity(inv, w, h, delta, min_area, max_area,
                                max_variation, min_diversity, out, max_out,
                                written);
    free(inv);
    return written;
}

// TBMR (tree-based Morse regions, Xu-Monasse-Najman-Géraud ICPR'14) over one
// tree polarity; the caller inverts the image for the other tree. Selected
// nodes: children of "critical" nodes (nodes where >= 2 branches merge),
// with area in [minimum_size, maximum_relative_area * npixels] — the branch
// segment's largest region, per the paper. Ellipse from component moments
// (semi-axes 2*sqrt(eig(cov)), OpenMVG AffinePointFeature convention).
// out: rows of 6 floats (x, y, l1, l2, orientation_rad, area).
int64_t r3d_tbmr(const uint8_t* img, int64_t w, int64_t h,
                 int64_t minimum_size, double maximum_relative_area,
                 float* out, int64_t max_out) {
    MaxTree t;
    if (!build_max_tree(img, w, h, t)) return -1;
    const int64_t n = w * h;
    const double max_area = maximum_relative_area * (double)n;

    int32_t* nchildren = (int32_t*)calloc(n, sizeof(int32_t));
    if (!nchildren) { t.release(); return -1; }
    for (int64_t k = 0; k < n; ++k) {
        const int64_t p = t.order[k];
        if (!t.is_canonical(p) || t.parent[p] == p) continue;
        int64_t q = t.parent[p];
        if (!t.is_canonical(q)) q = t.parent[q];
        nchildren[q]++;
    }
    int64_t written = 0;
    for (int64_t k = 0; k < n && written < max_out; ++k) {
        const int64_t p = t.order[k];
        if (!t.is_canonical(p) || t.parent[p] == p) continue;
        if (t.area[p] < (double)minimum_size || t.area[p] > max_area)
            continue;
        int64_t q = t.parent[p];
        if (!t.is_canonical(q)) q = t.parent[q];
        const bool parent_critical = (nchildren[q] >= 2) ||
                                     (t.parent[q] == q);
        if (!parent_critical) continue;
        const double a = t.area[p];
        const double cx = t.sx[p] / a, cy = t.sy[p] / a;
        const double vxx = t.sxx[p] / a - cx * cx;
        const double vyy = t.syy[p] / a - cy * cy;
        const double vxy = t.sxy[p] / a - cx * cy;
        const double tr = 0.5 * (vxx + vyy);
        double det = tr * tr - (vxx * vyy - vxy * vxy);
        if (det < 0) det = 0;
        const double root = det > 0 ? __builtin_sqrt(det) : 0.0;
        const double lam1 = tr + root, lam2 = tr - root;
        if (lam2 <= 0) continue;                  // degenerate (line-like)
        float* row = out + 6 * written;
        row[0] = (float)cx;
        row[1] = (float)cy;
        row[2] = (float)(2.0 * __builtin_sqrt(lam1));   // major semi-axis
        row[3] = (float)(2.0 * __builtin_sqrt(lam2));   // minor semi-axis
        // orientation of the major axis
        double phi = 0.5 * __builtin_atan2(2.0 * vxy, vxx - vyy);
        row[4] = (float)phi;
        row[5] = (float)a;
        ++written;
    }
    free(nchildren);
    t.release();
    return written;
}

// ---------------------------------------------------------------------------
// misc
// ---------------------------------------------------------------------------

const char* r3d_native_version() { return "r3d_native 0.2.0"; }

}  // extern "C"
