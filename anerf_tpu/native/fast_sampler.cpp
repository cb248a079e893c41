// Native host-side batch assembly for the training data path.
//
// The per-iteration host work (mask-restricted pixel sampling without
// replacement, pixel gathers from the flattened (H*W, C) image rows, ray
// direction assembly) is the framework's data-loader inner loop. The
// reference parallelizes it with 16 torch DataLoader worker processes
// (core/load_data.py:78-80); here it is a small C++ extension driven by a
// thread pool in the Python BatchLoader — no worker processes, no pickling.
//
// Exposed functions (CPython C API, no pybind11 dependency):
//   sample_mask_pixels(mask_u8 (N,), n_samples, seed) -> int64 (n_samples,)
//       sorted sample WITHOUT replacement of indices where mask > 0
//       (falls back to replacement only if fewer valid than requested).
//   gather_rays(dirs (HW, 3) f32, idxs (S,) i64, c2w (4,4) f32,
//               focal_x, focal_y) -> (rays_o (S,3) f32, rays_d (S,3) f32)
//       gathers precomputed pixel directions, divides by focal, rotates by
//       c2w and broadcasts the origin (mirrors dataset.get_rays,
//       core/dataset.py:346-364).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

// Buffer helpers --------------------------------------------------------

struct BufGuard {
  Py_buffer view{};
  bool ok = false;
  ~BufGuard() {
    if (ok) PyBuffer_Release(&view);
  }
};

bool get_buffer(PyObject* obj, BufGuard* g, const char* what) {
  if (PyObject_GetBuffer(obj, &g->view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) !=
      0) {
    PyErr_Format(PyExc_TypeError, "%s must be a C-contiguous buffer", what);
    return false;
  }
  g->ok = true;
  return true;
}

// sample_mask_pixels ----------------------------------------------------

PyObject* sample_mask_pixels(PyObject*, PyObject* args) {
  PyObject* mask_obj;
  Py_ssize_t n_samples;
  unsigned long long seed;
  if (!PyArg_ParseTuple(args, "OnK", &mask_obj, &n_samples, &seed)) {
    return nullptr;
  }
  BufGuard mask;
  if (!get_buffer(mask_obj, &mask, "mask")) return nullptr;

  const uint8_t* m = static_cast<const uint8_t*>(mask.view.buf);
  const Py_ssize_t n = mask.view.len / (mask.view.itemsize ? mask.view.itemsize : 1);

  std::vector<int64_t> out(static_cast<size_t>(n_samples));
  Py_BEGIN_ALLOW_THREADS;  // pure C loop: let loader threads overlap
  std::vector<int64_t> valid;
  valid.reserve(n / 8);
  for (Py_ssize_t i = 0; i < n; ++i) {
    if (m[i] > 0) valid.push_back(i);
  }
  std::mt19937_64 rng(seed);
  if (valid.empty()) {
    for (Py_ssize_t i = 0; i < n; ++i) valid.push_back(i);
  }

  const size_t nv = valid.size();
  if (static_cast<size_t>(n_samples) <= nv) {
    // partial Fisher-Yates: first n_samples entries are a uniform sample
    for (Py_ssize_t i = 0; i < n_samples; ++i) {
      std::uniform_int_distribution<size_t> d(i, nv - 1);
      std::swap(valid[i], valid[d(rng)]);
      out[i] = valid[i];
    }
  } else {
    std::uniform_int_distribution<size_t> d(0, nv - 1);
    for (Py_ssize_t i = 0; i < n_samples; ++i) out[i] = valid[d(rng)];
  }
  std::sort(out.begin(), out.end());
  Py_END_ALLOW_THREADS;

  PyObject* bytes =
      PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out.data()),
                                n_samples * sizeof(int64_t));
  return bytes;
}

// gather_rays -----------------------------------------------------------

PyObject* gather_rays(PyObject*, PyObject* args) {
  PyObject *dirs_obj, *idxs_obj, *c2w_obj;
  double focal_x, focal_y;
  if (!PyArg_ParseTuple(args, "OOOdd", &dirs_obj, &idxs_obj, &c2w_obj,
                        &focal_x, &focal_y)) {
    return nullptr;
  }
  BufGuard dirs, idxs, c2w;
  if (!get_buffer(dirs_obj, &dirs, "dirs")) return nullptr;
  if (!get_buffer(idxs_obj, &idxs, "idxs")) return nullptr;
  if (!get_buffer(c2w_obj, &c2w, "c2w")) return nullptr;

  const float* D = static_cast<const float*>(dirs.view.buf);
  const int64_t* I = static_cast<const int64_t*>(idxs.view.buf);
  const float* C = static_cast<const float*>(c2w.view.buf);
  const Py_ssize_t S = idxs.view.len / sizeof(int64_t);

  std::vector<float> rays(static_cast<size_t>(S) * 6);
  Py_BEGIN_ALLOW_THREADS;
  const float ox = C[3], oy = C[7], oz = C[11];
  const float r00 = C[0], r01 = C[1], r02 = C[2];
  const float r10 = C[4], r11 = C[5], r12 = C[6];
  const float r20 = C[8], r21 = C[9], r22 = C[10];
  const float inv_fx = 1.0f / static_cast<float>(focal_x);
  const float inv_fy = 1.0f / static_cast<float>(focal_y);

  for (Py_ssize_t s = 0; s < S; ++s) {
    const float* d = D + I[s] * 3;
    const float dx = d[0] * inv_fx, dy = d[1] * inv_fy, dz = d[2];
    float* o = rays.data() + s * 6;
    o[0] = ox;
    o[1] = oy;
    o[2] = oz;
    o[3] = r00 * dx + r01 * dy + r02 * dz;
    o[4] = r10 * dx + r11 * dy + r12 * dz;
    o[5] = r20 * dx + r21 * dy + r22 * dz;
  }
  Py_END_ALLOW_THREADS;
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(rays.data()),
      static_cast<Py_ssize_t>(rays.size() * sizeof(float)));
}

// gather_pixels ---------------------------------------------------------
// img_row (HW, C) u8, idxs (S,) i64 -> f32 bytes (S*C), scaled by 1/255.

PyObject* gather_pixels(PyObject*, PyObject* args) {
  PyObject *img_obj, *idxs_obj;
  Py_ssize_t channels;
  if (!PyArg_ParseTuple(args, "OOn", &img_obj, &idxs_obj, &channels)) {
    return nullptr;
  }
  BufGuard img, idxs;
  if (!get_buffer(img_obj, &img, "img")) return nullptr;
  if (!get_buffer(idxs_obj, &idxs, "idxs")) return nullptr;

  const uint8_t* P = static_cast<const uint8_t*>(img.view.buf);
  const int64_t* I = static_cast<const int64_t*>(idxs.view.buf);
  const Py_ssize_t S = idxs.view.len / sizeof(int64_t);

  std::vector<float> out(static_cast<size_t>(S * channels));
  Py_BEGIN_ALLOW_THREADS;
  constexpr float kInv = 1.0f / 255.0f;
  for (Py_ssize_t s = 0; s < S; ++s) {
    const uint8_t* p = P + I[s] * channels;
    for (Py_ssize_t c = 0; c < channels; ++c) {
      out[s * channels + c] = static_cast<float>(p[c]) * kInv;
    }
  }
  Py_END_ALLOW_THREADS;
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()),
      static_cast<Py_ssize_t>(out.size() * sizeof(float)));
}

PyMethodDef kMethods[] = {
    {"sample_mask_pixels", sample_mask_pixels, METH_VARARGS,
     "sorted sample w/o replacement of mask>0 indices"},
    {"gather_rays", gather_rays, METH_VARARGS,
     "gather pixel dirs -> world rays"},
    {"gather_pixels", gather_pixels, METH_VARARGS,
     "gather uint8 pixels -> f32/255"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "fast_sampler",
                       "native batch assembly", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit_fast_sampler(void) { return PyModule_Create(&kModule); }
