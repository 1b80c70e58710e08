// Native host-side preprocessing ops for deformationpyramid-tpu.
//
// C++ equivalents of the reference's C++ collate helpers:
//   * grid_subsample   <- cpp_wrappers/cpp_subsampling (voxel barycenters)
//   * radius_neighbors <- cpp_wrappers/cpp_neighbors (fixed-radius NN,
//     distance-ordered, shadow-padded)
// Built with the raw CPython + numpy C API (no pybind11 in this image).
// The Python wrapper (deformationpyramid_tpu/native) falls back to the
// numpy/scipy implementations in data/collate.py when unbuilt.
//
// Radius search uses a uniform voxel hash over the support cloud: O(N + Q*27
// cell visits) versus the kd-tree of the reference's nanoflann — simpler and
// faster at the small radii used by KPConv pyramids.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct CellKey {
    int64_t x, y, z;
    bool operator==(const CellKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};

struct CellHash {
    size_t operator()(const CellKey& k) const {
        // large-prime mix; point clouds are small enough that collisions
        // just cost a compare
        return static_cast<size_t>(
            k.x * 73856093LL ^ k.y * 19349669LL ^ k.z * 83492791LL);
    }
};

// ---------------------------------------------------------------------------
// grid_subsample(points[N,3] f32, dl) -> barycenters [M,3] f32
// (first-occurrence voxel order, matching data/collate.py grid_subsample)
// ---------------------------------------------------------------------------
PyObject* grid_subsample(PyObject*, PyObject* args) {
    PyArrayObject* pts_obj = nullptr;
    double dl = 0.0;
    if (!PyArg_ParseTuple(args, "O!d", &PyArray_Type, &pts_obj, &dl))
        return nullptr;

    PyArrayObject* pts = reinterpret_cast<PyArrayObject*>(
        PyArray_FROM_OTF(reinterpret_cast<PyObject*>(pts_obj), NPY_FLOAT32,
                         NPY_ARRAY_IN_ARRAY));
    if (!pts) return nullptr;
    if (PyArray_NDIM(pts) != 2 || PyArray_DIM(pts, 1) != 3) {
        Py_DECREF(pts);
        PyErr_SetString(PyExc_ValueError, "points must be [N,3]");
        return nullptr;
    }
    const npy_intp n = PyArray_DIM(pts, 0);
    const float* p = static_cast<const float*>(PyArray_DATA(pts));

    std::unordered_map<CellKey, int64_t, CellHash> voxel_id;
    voxel_id.reserve(static_cast<size_t>(n));
    std::vector<double> sums;   // [M*3]
    std::vector<int64_t> counts;

    for (npy_intp i = 0; i < n; ++i) {
        CellKey key{
            static_cast<int64_t>(std::floor(p[3 * i + 0] / dl)),
            static_cast<int64_t>(std::floor(p[3 * i + 1] / dl)),
            static_cast<int64_t>(std::floor(p[3 * i + 2] / dl))};
        auto it = voxel_id.find(key);
        int64_t id;
        if (it == voxel_id.end()) {
            id = static_cast<int64_t>(counts.size());
            voxel_id.emplace(key, id);
            sums.insert(sums.end(), {0.0, 0.0, 0.0});
            counts.push_back(0);
        } else {
            id = it->second;
        }
        sums[3 * id + 0] += p[3 * i + 0];
        sums[3 * id + 1] += p[3 * i + 1];
        sums[3 * id + 2] += p[3 * i + 2];
        counts[id] += 1;
    }

    const npy_intp m = static_cast<npy_intp>(counts.size());
    npy_intp dims[2] = {m, 3};
    PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
        PyArray_SimpleNew(2, dims, NPY_FLOAT32));
    float* o = static_cast<float*>(PyArray_DATA(out));
    for (npy_intp i = 0; i < m; ++i) {
        const double c = static_cast<double>(counts[i]);
        o[3 * i + 0] = static_cast<float>(sums[3 * i + 0] / c);
        o[3 * i + 1] = static_cast<float>(sums[3 * i + 1] / c);
        o[3 * i + 2] = static_cast<float>(sums[3 * i + 2] / c);
    }
    Py_DECREF(pts);
    return reinterpret_cast<PyObject*>(out);
}

// ---------------------------------------------------------------------------
// radius_neighbors(queries[Q,3] f32, supports[S,3] f32, radius, max_k)
//   -> [Q, max_k] int64, distance-ordered, shadow index == S
// ---------------------------------------------------------------------------
PyObject* radius_neighbors(PyObject*, PyObject* args) {
    PyArrayObject *q_obj = nullptr, *s_obj = nullptr;
    double radius = 0.0;
    long max_k = 0;
    if (!PyArg_ParseTuple(args, "O!O!dl", &PyArray_Type, &q_obj,
                          &PyArray_Type, &s_obj, &radius, &max_k))
        return nullptr;

    PyArrayObject* q = reinterpret_cast<PyArrayObject*>(PyArray_FROM_OTF(
        reinterpret_cast<PyObject*>(q_obj), NPY_FLOAT32, NPY_ARRAY_IN_ARRAY));
    PyArrayObject* s = reinterpret_cast<PyArrayObject*>(PyArray_FROM_OTF(
        reinterpret_cast<PyObject*>(s_obj), NPY_FLOAT32, NPY_ARRAY_IN_ARRAY));
    if (!q || !s) { Py_XDECREF(q); Py_XDECREF(s); return nullptr; }

    const npy_intp nq = PyArray_DIM(q, 0);
    const npy_intp ns = PyArray_DIM(s, 0);
    const float* qp = static_cast<const float*>(PyArray_DATA(q));
    const float* sp = static_cast<const float*>(PyArray_DATA(s));

    npy_intp dims[2] = {nq, static_cast<npy_intp>(max_k)};
    PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
        PyArray_SimpleNew(2, dims, NPY_INT64));
    int64_t* o = static_cast<int64_t*>(PyArray_DATA(out));
    std::fill(o, o + nq * max_k, static_cast<int64_t>(ns));

    if (ns > 0 && radius > 0.0) {
        // bucket supports into radius-sized cells
        const double cell = radius;
        std::unordered_map<CellKey, std::vector<int64_t>, CellHash> grid;
        grid.reserve(static_cast<size_t>(ns));
        for (npy_intp i = 0; i < ns; ++i) {
            CellKey key{
                static_cast<int64_t>(std::floor(sp[3 * i + 0] / cell)),
                static_cast<int64_t>(std::floor(sp[3 * i + 1] / cell)),
                static_cast<int64_t>(std::floor(sp[3 * i + 2] / cell))};
            grid[key].push_back(i);
        }

        const double r2 = radius * radius;
        std::vector<std::pair<float, int64_t>> cand;
        for (npy_intp i = 0; i < nq; ++i) {
            const float qx = qp[3 * i], qy = qp[3 * i + 1], qz = qp[3 * i + 2];
            const int64_t cx = static_cast<int64_t>(std::floor(qx / cell));
            const int64_t cy = static_cast<int64_t>(std::floor(qy / cell));
            const int64_t cz = static_cast<int64_t>(std::floor(qz / cell));
            cand.clear();
            for (int64_t dx = -1; dx <= 1; ++dx)
            for (int64_t dy = -1; dy <= 1; ++dy)
            for (int64_t dz = -1; dz <= 1; ++dz) {
                auto it = grid.find(CellKey{cx + dx, cy + dy, cz + dz});
                if (it == grid.end()) continue;
                for (int64_t j : it->second) {
                    const float ddx = sp[3 * j] - qx;
                    const float ddy = sp[3 * j + 1] - qy;
                    const float ddz = sp[3 * j + 2] - qz;
                    const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                    if (d2 <= r2) cand.emplace_back(d2, j);
                }
            }
            const size_t k = std::min(cand.size(),
                                      static_cast<size_t>(max_k));
            std::partial_sort(cand.begin(), cand.begin() + k, cand.end());
            for (size_t c = 0; c < k; ++c) o[i * max_k + c] = cand[c].second;
        }
    }
    Py_DECREF(q);
    Py_DECREF(s);
    return reinterpret_cast<PyObject*>(out);
}

PyMethodDef methods[] = {
    {"grid_subsample", grid_subsample, METH_VARARGS,
     "grid_subsample(points[N,3] f32, dl) -> barycenters [M,3] f32"},
    {"radius_neighbors", radius_neighbors, METH_VARARGS,
     "radius_neighbors(queries, supports, radius, max_k) -> [Q,K] int64"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "dp_native",
                      "native preprocessing ops", -1, methods,
                      nullptr, nullptr, nullptr, nullptr};

}  // namespace

PyMODINIT_FUNC PyInit_dp_native(void) {
    import_array();
    return PyModule_Create(&module);
}
