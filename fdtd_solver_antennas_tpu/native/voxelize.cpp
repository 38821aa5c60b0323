// Native voxelizer core: oriented-box containment over point grids.
//
// The TPU-native counterpart of the geometry rasterization CSXCAD.dll does
// in C++ for the reference (AddBox/AddTransform → cell properties). The
// Python voxelizer calls this for its hot loop — testing every Yee-edge
// midpoint / cell center against every scene primitive — and falls back to
// the NumPy implementation when the shared library is unavailable.
//
// Built by native/build.py:  g++ -O3 -shared -fPIC -std=c++17 voxelize.cpp -o _libvoxelize.so
// (-march=native deliberately omitted: the .so may outlive the host it was
//  built on; baseline vectorization is plenty for this memory-bound loop)
// Interface: plain C ABI consumed via ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>

extern "C" {

// Box record layout (doubles):
//   lo[3], hi[3]          local-frame bounds (already tolerance-inflated)
//   rot[9]                world→local rotation (row-major; identity if none)
//   origin[3]             rotation origin
//   trans[3]              translation
//   has_rot               0.0 or 1.0
// total: 22 doubles per box
constexpr int BOX_DOUBLES = 22;

// out[i] = 1 if pts[i] is inside the box (world frame), else unchanged.
// This "OR-accumulate" form lets callers paint multiple boxes into one
// mask without materializing intermediates.
void box_contains_or(const double* pts, int64_t n_pts,
                     const double* box, uint8_t* out) {
    const double* lo = box;
    const double* hi = box + 3;
    const double* rot = box + 6;
    const double* org = box + 15;
    const double* trn = box + 18;
    const bool has_rot = box[21] != 0.0;

    for (int64_t i = 0; i < n_pts; ++i) {
        double p0 = pts[3 * i] - trn[0];
        double p1 = pts[3 * i + 1] - trn[1];
        double p2 = pts[3 * i + 2] - trn[2];
        if (has_rot) {
            // local = (p - origin) @ R + origin   (row-vector convention,
            // matching models.scene.Box.to_local)
            const double q0 = p0 - org[0];
            const double q1 = p1 - org[1];
            const double q2 = p2 - org[2];
            p0 = q0 * rot[0] + q1 * rot[3] + q2 * rot[6] + org[0];
            p1 = q0 * rot[1] + q1 * rot[4] + q2 * rot[7] + org[1];
            p2 = q0 * rot[2] + q1 * rot[5] + q2 * rot[8] + org[2];
        }
        if (p0 >= lo[0] && p0 <= hi[0] &&
            p1 >= lo[1] && p1 <= hi[1] &&
            p2 >= lo[2] && p2 <= hi[2]) {
            out[i] = 1;
        }
    }
}

// Paint material values by priority order: for each box (pre-sorted
// ascending priority), overwrite eps/sigma wherever the cell center is
// inside. boxes: n_boxes × 22 doubles; vals: n_boxes × 2 (eps, sigma).
void paint_materials(const double* pts, int64_t n_pts,
                     const double* boxes, const double* vals,
                     int64_t n_boxes, double* eps, double* sigma) {
    for (int64_t b = 0; b < n_boxes; ++b) {
        const double* box = boxes + b * BOX_DOUBLES;
        const double* lo = box;
        const double* hi = box + 3;
        const double* rot = box + 6;
        const double* org = box + 15;
        const double* trn = box + 18;
        const bool has_rot = box[21] != 0.0;
        const double e = vals[2 * b];
        const double s = vals[2 * b + 1];
        for (int64_t i = 0; i < n_pts; ++i) {
            double p0 = pts[3 * i] - trn[0];
            double p1 = pts[3 * i + 1] - trn[1];
            double p2 = pts[3 * i + 2] - trn[2];
            if (has_rot) {
                const double q0 = p0 - org[0];
                const double q1 = p1 - org[1];
                const double q2 = p2 - org[2];
                p0 = q0 * rot[0] + q1 * rot[3] + q2 * rot[6] + org[0];
                p1 = q0 * rot[1] + q1 * rot[4] + q2 * rot[7] + org[1];
                p2 = q0 * rot[2] + q1 * rot[5] + q2 * rot[8] + org[2];
            }
            if (p0 >= lo[0] && p0 <= hi[0] &&
                p1 >= lo[1] && p1 <= hi[1] &&
                p2 >= lo[2] && p2 <= hi[2]) {
                eps[i] = e;
                sigma[i] = s;
            }
        }
    }
}

}  // extern "C"
