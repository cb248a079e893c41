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
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
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

// assemble_super_batch --------------------------------------------------
//
// Whole-dispatch batch assembly in one GIL-free call: for each of the
// M = stack*n_images items, mask-restricted pixel sampling (identical
// stream to sample_mask_pixels given the same per-item seed), ray
// assembly from a precomputed direction mesh, and pixel/fg/bg gathers,
// written directly into the caller's pre-allocated stacked output slabs.
// Replaces ~M Python get_item calls + per-key np.concatenate/np.stack
// per dispatch (the measured e2e loader bottleneck; the reference's
// analogue is the DataLoader worker pool + collate,
// core/load_data.py:78-80, core/dataset.py:813-820). Internally
// multithreaded over items; the GIL is released for the whole call.
//
// Item operands (length M, C-contiguous):
//   img_idxs i64; dirs_idxs i64 (row into dirs); bg_rows i64 (-1 = none);
//   c2ws f32 (M,16) row-major 4x4; focals f32 (M,2); seeds u64.
// Table operands: imgs u8 (N,HW,3); masks u8 (N,HW); smasks u8 (N,HW);
//   bgs u8 (B,HW,3) or 0-len; dirs f32 (D,HW,3).
// Outputs (writable, pre-allocated):
//   rays f32 (M*S, 11) = [o(3) d(3) near=0 far=1 viewdir(3)];
//   target f32 (M*S, 3); fg f32 (M*S, 1); bg f32 (M*S, 3).

struct SuperArgs {
  const uint8_t *imgs, *masks, *smasks, *bgs;
  const float *dirs;
  const int64_t *img_idxs, *dirs_idxs, *bg_rows;
  const float *c2ws, *focals;
  const uint64_t *seeds;
  float *rays, *target, *fg, *bg;
  Py_ssize_t M, S, HW;
  int mask_img;
};

void assemble_item(const SuperArgs& a, Py_ssize_t it,
                   std::vector<int64_t>* valid_scratch,
                   std::vector<int64_t>* out_scratch) {
  const Py_ssize_t S = a.S, HW = a.HW;
  const uint8_t* sm = a.smasks + a.img_idxs[it] * HW;

  // --- pixel sampling: identical to sample_mask_pixels(sm, S, seed) ---
  std::vector<int64_t>& valid = *valid_scratch;
  valid.clear();
  for (Py_ssize_t i = 0; i < HW; ++i) {
    if (sm[i] > 0) valid.push_back(i);
  }
  std::mt19937_64 rng(a.seeds[it]);
  if (valid.empty()) {
    for (Py_ssize_t i = 0; i < HW; ++i) valid.push_back(i);
  }
  const size_t nv = valid.size();
  std::vector<int64_t>& sel = *out_scratch;
  sel.resize(static_cast<size_t>(S));
  if (static_cast<size_t>(S) <= nv) {
    for (Py_ssize_t i = 0; i < S; ++i) {
      std::uniform_int_distribution<size_t> d(i, nv - 1);
      std::swap(valid[i], valid[d(rng)]);
      sel[i] = valid[i];
    }
  } else {
    std::uniform_int_distribution<size_t> d(0, nv - 1);
    for (Py_ssize_t i = 0; i < S; ++i) sel[i] = valid[d(rng)];
  }
  std::sort(sel.begin(), sel.end());

  // --- rays + viewdirs ---
  const float* C = a.c2ws + it * 16;
  const float* D = a.dirs + a.dirs_idxs[it] * HW * 3;
  const float fx = a.focals[it * 2], fy = a.focals[it * 2 + 1];
  const float inv_fx = 1.0f / fx, inv_fy = 1.0f / fy;
  const float ox = C[3], oy = C[7], oz = C[11];
  const uint8_t* img = a.imgs + a.img_idxs[it] * HW * 3;
  const uint8_t* msk = a.masks + a.img_idxs[it] * HW;
  const uint8_t* bgr =
      a.bg_rows[it] >= 0 ? a.bgs + a.bg_rows[it] * HW * 3 : nullptr;
  constexpr float kInv = 1.0f / 255.0f;

  for (Py_ssize_t s = 0; s < S; ++s) {
    const int64_t pix = sel[s];
    const float* d = D + pix * 3;
    const float dx = d[0] * inv_fx, dy = d[1] * inv_fy, dz = d[2];
    const float wx = C[0] * dx + C[1] * dy + C[2] * dz;
    const float wy = C[4] * dx + C[5] * dy + C[6] * dz;
    const float wz = C[8] * dx + C[9] * dy + C[10] * dz;
    float* r = a.rays + (it * S + s) * 11;
    r[0] = ox; r[1] = oy; r[2] = oz;
    r[3] = wx; r[4] = wy; r[5] = wz;
    r[6] = 0.0f; r[7] = 1.0f;
    const float inv_n = 1.0f / std::sqrt(wx * wx + wy * wy + wz * wz);
    r[8] = wx * inv_n; r[9] = wy * inv_n; r[10] = wz * inv_n;

    const float fgv = static_cast<float>(msk[pix]);
    a.fg[it * S + s] = fgv;
    float* t = a.target + (it * S + s) * 3;
    float* b = a.bg + (it * S + s) * 3;
    const uint8_t* p = img + pix * 3;
    if (bgr != nullptr) {
      const uint8_t* q = bgr + pix * 3;
      for (int c = 0; c < 3; ++c) {
        const float bv = static_cast<float>(q[c]) * kInv;
        float iv = static_cast<float>(p[c]) * kInv;
        if (a.mask_img) iv = iv * fgv + (1.0f - fgv) * bv;
        t[c] = iv;
        b[c] = bv;
      }
    } else {
      for (int c = 0; c < 3; ++c) {
        t[c] = static_cast<float>(p[c]) * kInv;
        b[c] = 1.0f;
      }
    }
  }
}

PyObject* assemble_super_batch(PyObject*, PyObject* args) {
  PyObject *imgs_o, *masks_o, *smasks_o, *bgs_o, *dirs_o;
  PyObject *img_idxs_o, *dirs_idxs_o, *bg_rows_o, *c2ws_o, *focals_o,
      *seeds_o;
  PyObject *rays_o, *target_o, *fg_o, *bg_o;
  Py_ssize_t S, HW;
  int mask_img, n_threads;
  if (!PyArg_ParseTuple(args, "OOOOOOOOOOOOOOOnnii", &imgs_o, &masks_o,
                        &smasks_o, &bgs_o, &dirs_o, &img_idxs_o,
                        &dirs_idxs_o, &bg_rows_o, &c2ws_o, &focals_o,
                        &seeds_o, &rays_o, &target_o, &fg_o, &bg_o, &S, &HW,
                        &mask_img, &n_threads)) {
    return nullptr;
  }
  BufGuard imgs, masks, smasks, bgs, dirs, img_idxs, dirs_idxs, bg_rows,
      c2ws, focals, seeds;
  if (!get_buffer(imgs_o, &imgs, "imgs")) return nullptr;
  if (!get_buffer(masks_o, &masks, "masks")) return nullptr;
  if (!get_buffer(smasks_o, &smasks, "smasks")) return nullptr;
  if (!get_buffer(bgs_o, &bgs, "bgs")) return nullptr;
  if (!get_buffer(dirs_o, &dirs, "dirs")) return nullptr;
  if (!get_buffer(img_idxs_o, &img_idxs, "img_idxs")) return nullptr;
  if (!get_buffer(dirs_idxs_o, &dirs_idxs, "dirs_idxs")) return nullptr;
  if (!get_buffer(bg_rows_o, &bg_rows, "bg_rows")) return nullptr;
  if (!get_buffer(c2ws_o, &c2ws, "c2ws")) return nullptr;
  if (!get_buffer(focals_o, &focals, "focals")) return nullptr;
  if (!get_buffer(seeds_o, &seeds, "seeds")) return nullptr;

  Py_buffer rays_b{}, target_b{}, fg_b{}, bg_b{};
  if (PyObject_GetBuffer(rays_o, &rays_b,
                         PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE) != 0 ||
      PyObject_GetBuffer(target_o, &target_b,
                         PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE) != 0 ||
      PyObject_GetBuffer(fg_o, &fg_b,
                         PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE) != 0 ||
      PyObject_GetBuffer(bg_o, &bg_b,
                         PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE) != 0) {
    PyErr_SetString(PyExc_TypeError, "outputs must be writable contiguous");
    if (rays_b.obj) PyBuffer_Release(&rays_b);
    if (target_b.obj) PyBuffer_Release(&target_b);
    if (fg_b.obj) PyBuffer_Release(&fg_b);
    return nullptr;
  }

  SuperArgs a;
  a.imgs = static_cast<const uint8_t*>(imgs.view.buf);
  a.masks = static_cast<const uint8_t*>(masks.view.buf);
  a.smasks = static_cast<const uint8_t*>(smasks.view.buf);
  a.bgs = static_cast<const uint8_t*>(bgs.view.buf);
  a.dirs = static_cast<const float*>(dirs.view.buf);
  a.img_idxs = static_cast<const int64_t*>(img_idxs.view.buf);
  a.dirs_idxs = static_cast<const int64_t*>(dirs_idxs.view.buf);
  a.bg_rows = static_cast<const int64_t*>(bg_rows.view.buf);
  a.c2ws = static_cast<const float*>(c2ws.view.buf);
  a.focals = static_cast<const float*>(focals.view.buf);
  a.seeds = static_cast<const uint64_t*>(seeds.view.buf);
  a.rays = static_cast<float*>(rays_b.buf);
  a.target = static_cast<float*>(target_b.buf);
  a.fg = static_cast<float*>(fg_b.buf);
  a.bg = static_cast<float*>(bg_b.buf);
  a.M = img_idxs.view.len / sizeof(int64_t);
  a.S = S;
  a.HW = HW;
  a.mask_img = mask_img;

  Py_BEGIN_ALLOW_THREADS;
  const int nt = std::max(1, std::min<int>(n_threads, a.M));
  if (nt == 1) {
    std::vector<int64_t> valid, sel;
    for (Py_ssize_t it = 0; it < a.M; ++it) {
      assemble_item(a, it, &valid, &sel);
    }
  } else {
    std::vector<std::thread> pool;
    std::atomic<Py_ssize_t> next(0);
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) {
      pool.emplace_back([&a, &next]() {
        std::vector<int64_t> valid, sel;
        for (;;) {
          const Py_ssize_t it = next.fetch_add(1);
          if (it >= a.M) break;
          assemble_item(a, it, &valid, &sel);
        }
      });
    }
    for (auto& t : pool) t.join();
  }
  Py_END_ALLOW_THREADS;

  PyBuffer_Release(&rays_b);
  PyBuffer_Release(&target_b);
  PyBuffer_Release(&fg_b);
  PyBuffer_Release(&bg_b);
  Py_RETURN_NONE;
}

PyMethodDef kMethods[] = {
    {"sample_mask_pixels", sample_mask_pixels, METH_VARARGS,
     "sorted sample w/o replacement of mask>0 indices"},
    {"gather_rays", gather_rays, METH_VARARGS,
     "gather pixel dirs -> world rays"},
    {"gather_pixels", gather_pixels, METH_VARARGS,
     "gather uint8 pixels -> f32/255"},
    {"assemble_super_batch", assemble_super_batch, METH_VARARGS,
     "whole-dispatch batch assembly, multithreaded, GIL-free"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "fast_sampler",
                       "native batch assembly", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit_fast_sampler(void) { return PyModule_Create(&kModule); }
