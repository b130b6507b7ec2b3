// Native midline chain: calculate_midline_from_outline in one call.
//
// Mirrors track/posture.py (itself rebuilt from the reference's
// Outline.cpp:330-1010 + commons periodic::eft/curvature) bit-exactly:
// smoothing -> signed-area orientation -> EFT approximation ->
// periodic curvature -> tail/head peaks -> midline walk ->
// post_process -> normalize resample. Exactness rules replicated from
// numpy 2.x (verified empirically in tests/test_posture_native.py):
//   - last-axis reductions use numpy's pairwise summation (<8
//     sequential, <=128 8-way unrolled + sequential remainder, else
//     halved recursion on a multiple-of-8 boundary)
//   - axis-0 / middle-axis reductions and cumsum are sequential
//   - float32 hypot == (float)hypot(double, double); cos/sin/acos/
//     atan2 come from the same libm numpy calls into
//   - python round() == rint() (half-to-even)
// Compile with -ffp-contract=off (build.py) so mul+add never fuses.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" int64_t trex_midline_walk(const float* pts, int64_t L,
                                     int32_t max_offset, float* seg_out,
                                     int64_t cap);

namespace {

// numpy pairwise_sum (numpy/_core/src/umath/loops_utils.h.src semantics)
template <typename T>
T pairwise_sum(const T* a, int64_t n) {
    if (n == 0) return T(0);
    if (n < 8) {
        T s = a[0];
        for (int64_t i = 1; i < n; i++) s = s + a[i];
        return s;
    }
    if (n <= 128) {
        T r[8];
        for (int i = 0; i < 8; i++) r[i] = a[i];
        int64_t i = 8;
        for (; i < n - (n % 8); i += 8)
            for (int j = 0; j < 8; j++) r[j] = r[j] + a[i + j];
        T res = ((r[0] + r[1]) + (r[2] + r[3]))
              + ((r[4] + r[5]) + (r[6] + r[7]));
        for (; i < n; i++) res = res + a[i];
        return res;
    }
    int64_t n2 = n / 2;
    n2 -= n2 % 8;
    return pairwise_sum(a, n2) + pairwise_sum(a + n2, n - n2);
}

inline float hypot32(float x, float y) {
    return (float)std::hypot((double)x, (double)y);
}

struct P32 { float x, y; };

// smooth_points (Outline.cpp:380-436): triangular periodic weights
std::vector<P32> smooth_points(const std::vector<P32>& pts,
                               double samples, int step) {
    const int64_t L = (int64_t)pts.size();
    if ((double)L <= samples || samples <= 0) return pts;
    const int step_row = (int)(samples * (double)step);
    if (step_row < 1) return pts;  // 0 < samples*step < 1: no smoothing
                                   // (a 0 step_row NaN-poisons weights)
    std::vector<int> offs;
    for (int o = -step_row; o <= step_row; o += step) offs.push_back(o);
    const int64_t K = (int64_t)offs.size();
    std::vector<double> w(K);
    for (int64_t k = 0; k < K; k++)
        w[k] = (double)(step_row - std::abs(offs[k])) / (double)step_row;
    const double wsum = pairwise_sum(w.data(), K);
    for (int64_t k = 0; k < K; k++) w[k] = w[k] / wsum;
    std::vector<P32> out(L);
    for (int64_t i = 0; i < L; i++) {
        double sx = 0.0, sy = 0.0;  // sequential middle-axis reduction
        for (int64_t k = 0; k < K; k++) {
            int64_t j = (i + offs[k]) % L;
            if (j < 0) j += L;
            const double px = (double)pts[j].x * w[k];
            const double py = (double)pts[j].y * w[k];
            if (k == 0) { sx = px; sy = py; }
            else { sx = sx + px; sy = sy + py; }
        }
        out[i].x = (float)sx;
        out[i].y = (float)sy;
    }
    return out;
}

double signed_area(const std::vector<P32>& p) {
    const int64_t L = (int64_t)p.size();
    std::vector<float> terms(L);
    for (int64_t i = 0; i < L; i++) {
        const int64_t j = (i + 1) % L;
        terms[i] = p[i].x * p[j].y - p[j].x * p[i].y;
    }
    return 0.5 * (double)pairwise_sum(terms.data(), L);
}

// EFT round-trip (commons periodic::eft/ieft, Kuhl & Giardina),
// matching track/posture.py eft()/ieft() dtype flow exactly.
void eft_roundtrip(std::vector<P32>& pts, int harmonics) {
    const int64_t L = (int64_t)pts.size();
    // center = points.mean(axis=0) in float32 (sequential axis-0 sum)
    float cx = pts[0].x, cy = pts[0].y;
    for (int64_t i = 1; i < L; i++) { cx = cx + pts[i].x; cy = cy + pts[i].y; }
    cx = cx / (float)L;
    cy = cy / (float)L;
    // d = diff of centered closed contour; dt = f32 hypot (0 -> 1e-12)
    std::vector<float> dx(L), dy(L), dt(L);
    for (int64_t i = 0; i < L; i++) {
        const int64_t j = (i + 1) % L;
        const float x0 = pts[i].x - cx, y0 = pts[i].y - cy;
        const float x1 = pts[j].x - cx, y1 = pts[j].y - cy;
        dx[i] = x1 - x0;
        dy[i] = y1 - y0;
        float h = hypot32(dx[i], dy[i]);
        dt[i] = (h == 0.0f) ? (float)1e-12 : h;
    }
    // t = [0, cumsum_f32(dt)] widened to double
    std::vector<double> t(L + 1);
    t[0] = 0.0;
    float run = dt[0];
    t[1] = (double)run;
    for (int64_t i = 1; i < L; i++) { run = run + dt[i]; t[i + 1] = (double)run; }
    const double T = t[L];
    const int H = harmonics;
    std::vector<double> A(H), B(H), C(H), D(H);
    std::vector<double> ta(L), tb(L), tc(L), td(L);
    for (int h = 1; h <= H; h++) {
        const double w = 2.0 * M_PI * (double)h;
        // np.pi ** 2 goes through CPython float_pow -> libm pow
        const double c = T / ((double)(2 * h * h) * std::pow(M_PI, 2.0));
        for (int64_t i = 0; i < L; i++) {
            const double p1 = w * t[i + 1] / T, p0 = w * t[i] / T;
            const double dcos = std::cos(p1) - std::cos(p0);
            const double dsin = std::sin(p1) - std::sin(p0);
            const float qx = dx[i] / dt[i];  // f32 division first
            const float qy = dy[i] / dt[i];
            ta[i] = (double)qx * dcos;
            tb[i] = (double)qx * dsin;
            tc[i] = (double)qy * dcos;
            td[i] = (double)qy * dsin;
        }
        A[h - 1] = c * pairwise_sum(ta.data(), L);
        B[h - 1] = c * pairwise_sum(tb.data(), L);
        C[h - 1] = c * pairwise_sum(tc.data(), L);
        D[h - 1] = c * pairwise_sum(td.data(), L);
    }
    // ieft back to L uniformly spaced points
    const double delta = T / (double)L;  // linspace endpoint=False
    for (int64_t k = 0; k < L; k++) {
        const double tk = (double)k * delta;
        double sx = 0.0, sy = 0.0;
        for (int h = 1; h <= H; h++) {  // sequential axis-0 sum
            const double phi = (2.0 * M_PI * (double)h) * tk / T;
            const double cph = std::cos(phi), sph = std::sin(phi);
            const double rx = A[h - 1] * cph + B[h - 1] * sph;
            const double ry = C[h - 1] * cph + D[h - 1] * sph;
            if (h == 1) { sx = rx; sy = ry; }
            else { sx = sx + rx; sy = sy + ry; }
        }
        pts[k].x = (float)((double)cx + sx);
        pts[k].y = (float)((double)cy + sy);
    }
}

struct P64 { double x, y; };

// Midline::midline_direction over float64 segments
P64 midline_direction(const std::vector<P64>& segs, double stiff) {
    const int64_t M = (int64_t)segs.size();
    int64_t n = std::max<int64_t>(1, (int64_t)((double)M * stiff));
    double dx = 0.0, dy = 0.0;
    int64_t cnt = 0;
    for (int64_t i = 0; i < n; i++) {
        if (i + 1 >= M) break;
        dx += segs[i + 1].x - segs[i].x;
        dy += segs[i + 1].y - segs[i].y;
        cnt++;
    }
    if (cnt) {
        dx /= (double)cnt;
        dy /= (double)cnt;
        const double norm = std::hypot(dx, dy);
        if (norm > 0) { dx /= norm; dy /= norm; }
    }
    return {dx, dy};
}

inline double clip1(double v) {
    return v < -1.0 ? -1.0 : (v > 1.0 ? 1.0 : v);
}

// Midline::post_process (Outline.cpp:890-1010)
void post_process(std::vector<P64>& segs, std::vector<double>& heights,
                  int32_t* tail_index, int32_t* head_index,
                  int32_t* inverted,
                  double stiff, int midline_invert, int start_with_head,
                  const double* movement_dir) {
    const int64_t M = (int64_t)segs.size();
    if (M <= 2) return;
    bool needs_invert = !midline_invert;
    P64 dir = midline_direction(segs, stiff);
    double dx = needs_invert ? dir.x : -dir.x;
    double dy = needs_invert ? dir.y : -dir.y;
    if (movement_dir && (movement_dir[0] != 0.0 || movement_dir[1] != 0.0)) {
        double mx = movement_dir[0], my = movement_dir[1];
        const double nv = std::hypot(mx, my);
        if (nv > 0) { mx /= nv; my /= nv; }
        const double neg = std::acos(clip1((-dx) * mx + (-dy) * my));
        const double pos = std::acos(clip1(dx * mx + dy * my));
        if (neg < pos) {
            needs_invert = !needs_invert;
            *inverted = 1;
            std::swap(*tail_index, *head_index);
        }
    }
    bool reverse = false;
    if (needs_invert) {
        if (!start_with_head) reverse = true;
    } else if (start_with_head) {
        reverse = true;
    }
    if (reverse) {
        std::reverse(segs.begin(), segs.end());
        std::reverse(heights.begin(), heights.end());
    }
    if (stiff > 0) {
        const int64_t n = M;
        const int64_t center = (int64_t)std::min(
            (double)(n - 1), std::rint((double)n * stiff) + 1.0);
        const P64 center_point = segs[center];
        double ax = 0.0, ay = 0.0;
        int64_t count = 0;
        const int64_t extra = (int64_t)std::min(
            (double)n, (double)center + std::max(0.0, (double)n * 0.1));
        for (int64_t i = center; i < extra; i++) {
            if (i + 1 >= n) break;
            const double vx = segs[i].x - segs[i + 1].x;
            const double vy = segs[i].y - segs[i + 1].y;
            const double nv = std::hypot(vx, vy);
            if (nv > 0) { ax += vx / nv; ay += vy / nv; }
            count++;
        }
        if (count > 0) { ax /= (double)count; ay /= (double)count; }
        std::vector<P64> copy(segs);
        for (int64_t i = center; i > 0; i--) {
            const P64 p1 = segs[i];
            const double seg_len = std::hypot(copy[i].x - copy[i - 1].x,
                                              copy[i].y - copy[i - 1].y);
            double tx = segs[i - 1].x - center_point.x;
            double ty = segs[i - 1].y - center_point.y;
            double nv = std::hypot(tx, ty);
            if (nv > 0) { tx /= nv; ty /= nv; }
            double ex = (tx + ax) * 0.5, ey = (ty + ay) * 0.5;
            nv = std::hypot(ex, ey);
            if (nv > 0) { ex /= nv; ey /= nv; }
            segs[i - 1].x = p1.x + seg_len * ex;
            segs[i - 1].y = p1.y + seg_len * ey;
        }
    }
}

// Midline::normalize arc-length resampler (Outline.cpp:1279-1376),
// matching _normalize_resample's float32 positions / double walk.
bool normalize_resample(const std::vector<P64>& segments, int resolution,
                        std::vector<P32>& reduced) {
    const int64_t n = (int64_t)segments.size();
    if (n < 2) return false;
    std::vector<P32> segs(n);
    for (int64_t i = 0; i < n; i++) {
        segs[i].x = (float)segments[i].x;
        segs[i].y = (float)segments[i].y;
    }
    std::vector<double> lens(n - 1);
    for (int64_t i = 0; i + 1 < n; i++)
        lens[i] = (double)hypot32(segs[i + 1].x - segs[i].x,
                                  segs[i + 1].y - segs[i].y);
    const double raw_len = pairwise_sum(lens.data(), n - 1);
    if (raw_len == 0.0) return false;
    const int max_segments = resolution - 1;
    const double step = raw_len / (double)max_segments;
    reduced.clear();
    reduced.push_back(segs[0]);
    int64_t index = 0;
    double last_pt_distance = 0.0, distance = 0.0;
    while (distance <= raw_len && index < n - 1) {
        while (distance - last_pt_distance < step && index < n - 1) {
            distance += lens[index];
            index++;
        }
        double off = distance - last_pt_distance;
        if (off < step) break;
        while (off >= step) {
            off -= step;
            if (index > 0) {
                const P32 s0 = segs[index - 1], s1 = segs[index];
                const float lx = s1.x - s0.x, ly = s1.y - s0.y;
                const double local_d = (double)hypot32(lx, ly);
                double percent = off;
                if (local_d > 0) percent /= local_d;
                percent = 1.0 - percent;
                const float pf = (float)percent;
                P32 pos{s0.x + lx * pf, s0.y + ly * pf};
                reduced.push_back(pos);
                const float rf = (float)(1.0 - percent);
                const float rx = lx * rf, ry = ly * rf;
                last_pt_distance = distance - (double)hypot32(rx, ry);
            } else {
                reduced.push_back(segs[index]);
                last_pt_distance = distance;
            }
        }
    }
    const P32 last = reduced.back();
    if ((double)hypot32(last.x - segs[n - 1].x,
                        last.y - segs[n - 1].y) >= 0.01)
        reduced.push_back(segs[n - 1]);
    return (int64_t)reduced.size() == resolution;
}

}  // namespace

extern "C" {

// Full calculate_midline_from_outline. Returns 0 on success; 1..4 map
// to the python path's None outcomes (too few points / no peaks /
// walk too short / resample mismatch), -1 on capacity overflow.
int32_t trex_midline_chain(
    const float* points_in, int64_t n_in,
    double smooth_samples, int32_t smooth_step, int32_t n_approx,
    double curvature_range_ratio, int32_t midline_invert,
    double walk_offset, double stiff_percentage,
    int32_t start_with_head, int32_t resolution,
    const double* movement_dir,  // nullptr when absent
    double* out_segments, double* out_heights, int64_t max_seg,
    int64_t* out_nseg, int32_t* out_tail, int32_t* out_head,
    double* out_len, double* out_angle, int32_t* out_inverted) {
    if (n_in < 3) return 1;
    std::vector<P32> pts(n_in);
    std::memcpy(pts.data(), points_in, sizeof(float) * 2 * n_in);

    if (smooth_samples > 0)
        pts = smooth_points(pts, smooth_samples,
                            std::max(1, (int)smooth_step));
    if (signed_area(pts) < 0)
        std::reverse(pts.begin(), pts.end());
    if (n_approx > 0 && (int64_t)pts.size() > 2)
        eft_roundtrip(pts, n_approx);

    const int64_t L = (int64_t)pts.size();
    if (L < 3) return 1;
    const int64_t rng = std::max<int64_t>(
        1, (int64_t)(curvature_range_ratio * (double)L));

    // periodic Menger curvature, float32 like the numpy path
    std::vector<float> curv(L);
    for (int64_t i = 0; i < L; i++) {
        const int64_t i1 = ((i - rng) % L + L) % L;
        const int64_t i3 = (i + rng) % L;
        const float ax = pts[i].x - pts[i1].x, ay = pts[i].y - pts[i1].y;
        const float bx = pts[i3].x - pts[i].x, by = pts[i3].y - pts[i].y;
        const float cross = ax * by - ay * bx;
        const float d12 = hypot32(ax, ay);
        const float d23 = hypot32(bx, by);
        const float d13 = hypot32(pts[i3].x - pts[i1].x,
                                  pts[i3].y - pts[i1].y);
        const float prod = d12 * d23 * d13;
        const float m = std::max(prod, (float)1e-12);
        const float denom = std::sqrt(m);
        curv[i] = 2.0f * cross / denom;
    }
    // peaks: curv >= left && curv > right (periodic)
    std::vector<int64_t> peaks;
    for (int64_t i = 0; i < L; i++) {
        const float left = curv[((i - 1) % L + L) % L];
        const float right = curv[(i + 1) % L];
        if (curv[i] >= left && curv[i] > right) peaks.push_back(i);
    }
    if (peaks.empty()) return 2;
    int64_t tail = peaks[0];
    for (int64_t p : peaks)
        if (curv[p] > curv[tail]) tail = p;  // first max wins
    int64_t head = -1, max_d = -1;
    for (int64_t p : peaks) {
        int64_t d = std::abs(p - tail);
        d = std::min(d, L - d);
        if (d > max_d) { max_d = d; head = p; }
    }
    // rotate tail to index 0
    std::vector<float> rot(2 * L);
    for (int64_t i = 0; i < L; i++) {
        const int64_t j = (i + tail) % L;
        rot[2 * i] = pts[j].x;
        rot[2 * i + 1] = pts[j].y;
    }
    int32_t tail_index = 0;
    int32_t head_index = head >= 0
        ? (int32_t)(((head - tail) % L + L) % L) : -1;
    if (midline_invert) std::swap(tail_index, head_index);

    const int32_t max_offset = std::max(
        3, (int)(walk_offset * (double)L));
    std::vector<float> seg(3 * (L + 4));
    const int64_t m = trex_midline_walk(rot.data(), L, max_offset,
                                        seg.data(), L + 4);
    if (m <= 2) return 3;
    if (m > max_seg) return -1;

    std::vector<P64> segs(m);
    std::vector<double> heights(m);
    for (int64_t i = 0; i < m; i++) {
        segs[i].x = (double)seg[3 * i];
        segs[i].y = (double)seg[3 * i + 1];
        heights[i] = (double)seg[3 * i + 2];
    }
    int32_t inverted = 0;
    post_process(segs, heights, &tail_index, &head_index, &inverted,
                 stiff_percentage, midline_invert, start_with_head,
                 movement_dir);
    std::vector<P32> reduced;
    if (!normalize_resample(segs, resolution, reduced)) return 4;
    // len = pairwise f32 sum of resampled chord lengths
    std::vector<float> chord(reduced.size() - 1);
    for (size_t i = 0; i + 1 < reduced.size(); i++)
        chord[i] = hypot32(reduced[i + 1].x - reduced[i].x,
                           reduced[i + 1].y - reduced[i].y);
    const double len = (double)pairwise_sum(chord.data(),
                                            (int64_t)chord.size());
    const P64 dir = midline_direction(segs, stiff_percentage);
    const double angle = std::atan2(dir.y, dir.x);

    for (int64_t i = 0; i < m; i++) {
        out_segments[2 * i] = segs[i].x;
        out_segments[2 * i + 1] = segs[i].y;
        out_heights[i] = heights[i];
    }
    *out_nseg = m;
    *out_tail = tail_index;
    *out_head = head_index;
    *out_len = len;
    *out_angle = angle;
    *out_inverted = inverted;
    return 0;
}

}  // extern "C"
