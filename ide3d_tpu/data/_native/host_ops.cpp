// host_ops: native (C++) host-side data-path kernels for ide3d_tpu.
//
// The reference framework's native layer is CUDA compute kernels; on TPU the
// compute path is XLA/Pallas, so the native layer here is the HOST runtime: the
// per-sample data transforms that sit on the input pipeline's critical path and
// were C++-worker-pool territory in the reference (torch DataLoader workers,
// apps/train_hybrid_encoder.py:221-226). Python loops over 512x512x19 one-hot
// encodes burn milliseconds per sample; these kernels run at memory speed and
// release the GIL so the prefetch threads in data/prefetch.py actually overlap.
//
// Exposed functions (CPython C API, no pybind11 — see build.py):
//   onehot_seg(mask_u8 [H,W], num_classes) -> float32 [H, W, C] in {-1, +1}
//   normalize_img(img_u8 [H,W,3])          -> float32 [H, W, 3] in [-1, 1]
//   batch_assemble(imgs: list[u8 HWC], segs: list[u8 HW]|None, num_classes,
//                  xflip: list[int]) -> (f32 [B,H,W,3], f32 [B,H,W,C]|None)
//
// All outputs are freshly-allocated, C-contiguous numpy arrays.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// mask [H, W] uint8 -> one-hot [H, W, C] float32 scaled to {-1, +1}
// (the encoder input convention, apps/train_hybrid_encoder.py:266,297).
void onehot_kernel(const uint8_t* mask, float* out, npy_intp h, npy_intp w,
                   int num_classes, bool flip_x) {
  const npy_intp hw = h * w;
  for (npy_intp i = 0; i < hw * num_classes; ++i) out[i] = -1.0f;
  for (npy_intp y = 0; y < h; ++y) {
    const uint8_t* row = mask + y * w;
    float* orow = out + y * w * num_classes;
    for (npy_intp x = 0; x < w; ++x) {
      const npy_intp sx = flip_x ? (w - 1 - x) : x;
      int cls = row[sx];
      if (cls >= num_classes) cls = 0;
      orow[x * num_classes + cls] = 1.0f;
    }
  }
}

// img [H, W, 3] uint8 -> float32 [-1, 1], optional horizontal flip.
void normalize_kernel(const uint8_t* img, float* out, npy_intp h, npy_intp w,
                      bool flip_x) {
  constexpr float kScale = 1.0f / 127.5f;
  for (npy_intp y = 0; y < h; ++y) {
    const uint8_t* row = img + y * w * 3;
    float* orow = out + y * w * 3;
    for (npy_intp x = 0; x < w; ++x) {
      const npy_intp sx = flip_x ? (w - 1 - x) : x;
      orow[x * 3 + 0] = row[sx * 3 + 0] * kScale - 1.0f;
      orow[x * 3 + 1] = row[sx * 3 + 1] * kScale - 1.0f;
      orow[x * 3 + 2] = row[sx * 3 + 2] * kScale - 1.0f;
    }
  }
}

PyArrayObject* as_u8_array(PyObject* obj, int ndim_expected) {
  PyArrayObject* arr = (PyArrayObject*)PyArray_FROM_OTF(
      obj, NPY_UINT8, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
  if (!arr) return nullptr;
  if (PyArray_NDIM(arr) != ndim_expected) {
    PyErr_Format(PyExc_ValueError, "expected %d-d uint8 array, got %d-d",
                 ndim_expected, PyArray_NDIM(arr));
    Py_DECREF(arr);
    return nullptr;
  }
  return arr;
}

PyObject* py_onehot_seg(PyObject*, PyObject* args) {
  PyObject* mask_obj;
  int num_classes = 19;
  int flip = 0;
  if (!PyArg_ParseTuple(args, "O|ip", &mask_obj, &num_classes, &flip)) return nullptr;
  PyArrayObject* mask = as_u8_array(mask_obj, 2);
  if (!mask) return nullptr;

  npy_intp h = PyArray_DIM(mask, 0), w = PyArray_DIM(mask, 1);
  npy_intp dims[3] = {h, w, num_classes};
  PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(3, dims, NPY_FLOAT32);
  if (!out) {
    Py_DECREF(mask);
    return nullptr;
  }
  Py_BEGIN_ALLOW_THREADS
  onehot_kernel((const uint8_t*)PyArray_DATA(mask), (float*)PyArray_DATA(out),
                h, w, num_classes, flip != 0);
  Py_END_ALLOW_THREADS
  Py_DECREF(mask);
  return (PyObject*)out;
}

PyObject* py_normalize_img(PyObject*, PyObject* args) {
  PyObject* img_obj;
  int flip = 0;
  if (!PyArg_ParseTuple(args, "O|p", &img_obj, &flip)) return nullptr;
  PyArrayObject* img = as_u8_array(img_obj, 3);
  if (!img) return nullptr;
  if (PyArray_DIM(img, 2) != 3) {
    PyErr_SetString(PyExc_ValueError, "expected [H, W, 3] image");
    Py_DECREF(img);
    return nullptr;
  }
  npy_intp h = PyArray_DIM(img, 0), w = PyArray_DIM(img, 1);
  npy_intp dims[3] = {h, w, 3};
  PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(3, dims, NPY_FLOAT32);
  if (!out) {
    Py_DECREF(img);
    return nullptr;
  }
  Py_BEGIN_ALLOW_THREADS
  normalize_kernel((const uint8_t*)PyArray_DATA(img), (float*)PyArray_DATA(out),
                   h, w, flip != 0);
  Py_END_ALLOW_THREADS
  Py_DECREF(img);
  return (PyObject*)out;
}

PyObject* py_batch_assemble(PyObject*, PyObject* args) {
  PyObject *imgs_obj, *segs_obj, *flips_obj;
  int num_classes = 19;
  if (!PyArg_ParseTuple(args, "OOO|i", &imgs_obj, &segs_obj, &flips_obj,
                        &num_classes))
    return nullptr;

  PyObject* imgs_seq = PySequence_Fast(imgs_obj, "imgs must be a sequence");
  if (!imgs_seq) return nullptr;
  Py_ssize_t B = PySequence_Fast_GET_SIZE(imgs_seq);

  PyObject* flips_seq = PySequence_Fast(flips_obj, "xflip must be a sequence");
  if (!flips_seq) {
    Py_DECREF(imgs_seq);
    return nullptr;
  }

  const bool have_segs = segs_obj != Py_None;
  PyObject* segs_seq = nullptr;
  if (have_segs) {
    segs_seq = PySequence_Fast(segs_obj, "segs must be a sequence");
    if (!segs_seq) {
      Py_DECREF(imgs_seq);
      Py_DECREF(flips_seq);
      return nullptr;
    }
  }

  PyArrayObject* img_batch = nullptr;
  PyArrayObject* seg_batch = nullptr;
  std::vector<PyArrayObject*> imgs(B, nullptr), segs(B, nullptr);
  npy_intp h = 0, w = 0;
  bool ok = true;

  for (Py_ssize_t i = 0; i < B && ok; ++i) {
    imgs[i] = as_u8_array(PySequence_Fast_GET_ITEM(imgs_seq, i), 3);
    if (!imgs[i]) { ok = false; break; }
    if (i == 0) {
      h = PyArray_DIM(imgs[0], 0);
      w = PyArray_DIM(imgs[0], 1);
    } else if (PyArray_DIM(imgs[i], 0) != h || PyArray_DIM(imgs[i], 1) != w) {
      PyErr_SetString(PyExc_ValueError, "inconsistent image sizes in batch");
      ok = false;
      break;
    }
    if (have_segs) {
      segs[i] = as_u8_array(PySequence_Fast_GET_ITEM(segs_seq, i), 2);
      if (!segs[i]) { ok = false; break; }
    }
  }

  if (ok) {
    npy_intp idims[4] = {B, h, w, 3};
    img_batch = (PyArrayObject*)PyArray_SimpleNew(4, idims, NPY_FLOAT32);
    if (!img_batch) ok = false;
    if (ok && have_segs) {
      npy_intp sdims[4] = {B, h, w, num_classes};
      seg_batch = (PyArrayObject*)PyArray_SimpleNew(4, sdims, NPY_FLOAT32);
      if (!seg_batch) ok = false;
    }
  }

  if (ok) {
    std::vector<int> flips(B, 0);
    for (Py_ssize_t i = 0; i < B; ++i) {
      PyObject* f = PySequence_Fast_GET_ITEM(flips_seq, i);
      flips[i] = PyObject_IsTrue(f);
    }
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 0; i < B; ++i) {
      normalize_kernel((const uint8_t*)PyArray_DATA(imgs[i]),
                       (float*)PyArray_DATA(img_batch) + i * h * w * 3, h, w,
                       flips[i] != 0);
      if (have_segs) {
        onehot_kernel((const uint8_t*)PyArray_DATA(segs[i]),
                      (float*)PyArray_DATA(seg_batch) + i * h * w * num_classes,
                      h, w, num_classes, flips[i] != 0);
      }
    }
    Py_END_ALLOW_THREADS
  }

  for (auto* a : imgs) Py_XDECREF(a);
  for (auto* a : segs) Py_XDECREF(a);
  Py_DECREF(imgs_seq);
  Py_DECREF(flips_seq);
  Py_XDECREF(segs_seq);

  if (!ok) {
    Py_XDECREF(img_batch);
    Py_XDECREF(seg_batch);
    return nullptr;
  }
  if (have_segs) {
    PyObject* tup = PyTuple_Pack(2, (PyObject*)img_batch, (PyObject*)seg_batch);
    Py_DECREF(img_batch);
    Py_DECREF(seg_batch);
    return tup;
  }
  PyObject* tup = PyTuple_Pack(2, (PyObject*)img_batch, Py_None);
  Py_DECREF(img_batch);
  return tup;
}

PyMethodDef kMethods[] = {
    {"onehot_seg", py_onehot_seg, METH_VARARGS,
     "onehot_seg(mask_u8[H,W], num_classes=19, flip=False) -> f32 [H,W,C] in {-1,1}"},
    {"normalize_img", py_normalize_img, METH_VARARGS,
     "normalize_img(img_u8[H,W,3], flip=False) -> f32 [H,W,3] in [-1,1]"},
    {"batch_assemble", py_batch_assemble, METH_VARARGS,
     "batch_assemble(imgs, segs|None, xflips, num_classes=19) -> (f32[B,H,W,3], f32[B,H,W,C]|None)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "host_ops",
                       "native host-side data-path kernels", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit_host_ops(void) {
  PyObject* m = PyModule_Create(&kModule);
  if (!m) return nullptr;
  import_array();
  return m;
}
