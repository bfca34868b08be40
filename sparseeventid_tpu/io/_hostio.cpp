// Host-side batch assembly engine — the native replacement for larcv3's
// C++ BatchFillerSparseTensor (reference uses larcv3's threaded C++ fillers,
// /root/reference/src/io/larcv_fetcher.py:112-119).
//
// Converts per-event (linear voxel id, value) arrays into the padded
// [B, MaxVoxels, D+1] batch layout (-999 fill), with per-event Normalize
// (mean 1.0, std 0.5 — larcv_fetcher.py:100-108) and optional augmentation
// (mirror / gaussian jitter / translate — larcv_fetcher.py:229-261), using a
// std::thread pool with the GIL released.
//
// Exposed via the CPython C API + numpy (no pybind11 in this environment).

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

struct EventRef {
  const uint64_t* ids;
  const float* vals;
  npy_intp n;
};

struct AugmentParams {
  bool enabled = false;
  bool mirror = true;
  float blur_sigma = 0.05f;
  int translate[3] = {0, 0, 0};
  uint64_t seed = 0;
};

// One event -> one padded row block of the output.
void fill_event(const EventRef& ev, float* out, npy_intp max_voxels,
                const int64_t* dims, int ndim, bool normalize,
                const AugmentParams& aug, uint64_t event_index) {
  const npy_intp row_w = ndim + 1;
  // -999 fill
  for (npy_intp i = 0; i < max_voxels * row_w; ++i) out[i] = -999.0f;

  npy_intp n = std::min(ev.n, max_voxels);
  if (n <= 0) return;

  // normalization stats over ALL voxels of the event (pre-truncation,
  // matching larcv which normalizes the tensor before filling)
  float mean = 0.f, std = 1.f;
  if (normalize && ev.n > 1) {
    double s1 = 0., s2 = 0.;
    for (npy_intp i = 0; i < ev.n; ++i) {
      s1 += ev.vals[i];
      s2 += double(ev.vals[i]) * ev.vals[i];
    }
    mean = float(s1 / ev.n);
    double var = s2 / ev.n - double(mean) * mean;
    std = float(std::sqrt(var > 0 ? var : 0) + 1e-6);
  }

  std::mt19937_64 rng(aug.seed * 0x9E3779B97F4A7C15ULL + event_index);
  std::normal_distribution<float> jitter(0.f, aug.blur_sigma);
  bool flip[3] = {false, false, false};
  long shift[3] = {0, 0, 0};
  if (aug.enabled) {
    for (int d = 0; d < ndim; ++d) {
      if (aug.mirror) flip[d] = (rng() & 1) != 0;
      if (aug.translate[d] > 0) {
        std::uniform_int_distribution<long> u(-aug.translate[d],
                                              aug.translate[d]);
        shift[d] = u(rng);
      }
    }
  }

  npy_intp w = 0;
  for (npy_intp i = 0; i < n; ++i) {
    uint64_t id = ev.ids[i];
    long coord[3];
    for (int d = ndim - 1; d >= 0; --d) {
      coord[d] = long(id % uint64_t(dims[d]));
      id /= uint64_t(dims[d]);
    }
    bool ok = true;
    for (int d = 0; d < ndim && ok; ++d) {
      long c = coord[d];
      if (aug.enabled) {
        if (flip[d]) c = dims[d] - 1 - c;
        if (aug.blur_sigma > 0)
          c = long(std::lround(float(c) + jitter(rng)));
        c += shift[d];
      }
      coord[d] = c;
      if (c < 0 || c >= dims[d]) ok = false;
    }
    if (!ok) continue;
    float* row = out + w * row_w;
    for (int d = 0; d < ndim; ++d) row[d] = float(coord[d]);
    float v = ev.vals[i];
    if (normalize) v = (v - mean) / std * 0.5f + 1.0f;
    row[ndim] = v;
    ++w;
  }
}

PyObject* assemble_sparse_batch(PyObject*, PyObject* args, PyObject* kwargs) {
  PyObject* events_obj;          // list of (ids u64[n], vals f32[n]) tuples
  long max_voxels;
  PyObject* dims_obj;            // tuple of ints
  int normalize = 1;
  int augment = 0;
  double blur_sigma = 0.05;
  PyObject* translate_obj = nullptr;
  unsigned long long seed = 0;
  static const char* kwlist[] = {"events", "max_voxels", "dims", "normalize",
                                 "augment", "blur_sigma", "translate",
                                 "seed", nullptr};
  if (!PyArg_ParseTupleAndKeywords(
          args, kwargs, "OlO|iidOK", const_cast<char**>(kwlist), &events_obj,
          &max_voxels, &dims_obj, &normalize, &augment, &blur_sigma,
          &translate_obj, &seed))
    return nullptr;

  if (!PyList_Check(events_obj)) {
    PyErr_SetString(PyExc_TypeError, "events must be a list");
    return nullptr;
  }
  Py_ssize_t b = PyList_Size(events_obj);
  int ndim = int(PyTuple_Size(dims_obj));
  if (ndim < 1 || ndim > 3) {
    PyErr_SetString(PyExc_ValueError, "dims must have 1..3 entries");
    return nullptr;
  }
  int64_t dims[3] = {1, 1, 1};
  for (int d = 0; d < ndim; ++d)
    dims[d] = PyLong_AsLongLong(PyTuple_GetItem(dims_obj, d));

  AugmentParams aug;
  aug.enabled = augment != 0;
  aug.blur_sigma = float(blur_sigma);
  aug.seed = seed;
  if (translate_obj && translate_obj != Py_None) {
    for (int d = 0; d < ndim && d < int(PySequence_Size(translate_obj)); ++d) {
      PyObject* it = PySequence_GetItem(translate_obj, d);
      aug.translate[d] = int(PyLong_AsLong(it));
      Py_XDECREF(it);
    }
  }

  // collect event array pointers (with refs held)
  std::vector<EventRef> events(b);
  std::vector<PyObject*> holds;
  holds.reserve(2 * b);
  for (Py_ssize_t i = 0; i < b; ++i) {
    PyObject* tup = PyList_GetItem(events_obj, i);
    PyObject* ids_o = PyTuple_GetItem(tup, 0);
    PyObject* vals_o = PyTuple_GetItem(tup, 1);
    PyArrayObject* ids = (PyArrayObject*)PyArray_FROM_OTF(
        ids_o, NPY_UINT64, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
    PyArrayObject* vals = (PyArrayObject*)PyArray_FROM_OTF(
        vals_o, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
    if (!ids || !vals) {
      for (auto* h : holds) Py_DECREF(h);
      Py_XDECREF((PyObject*)ids);
      Py_XDECREF((PyObject*)vals);
      return nullptr;
    }
    holds.push_back((PyObject*)ids);
    holds.push_back((PyObject*)vals);
    events[i] = {(const uint64_t*)PyArray_DATA(ids),
                 (const float*)PyArray_DATA(vals),
                 PyArray_SIZE(ids)};
  }

  npy_intp shape[3] = {b, max_voxels, ndim + 1};
  PyArrayObject* out =
      (PyArrayObject*)PyArray_SimpleNew(3, shape, NPY_FLOAT32);
  if (!out) {
    for (auto* h : holds) Py_DECREF(h);
    return nullptr;
  }
  float* out_data = (float*)PyArray_DATA(out);
  const npy_intp stride = max_voxels * (ndim + 1);

  Py_BEGIN_ALLOW_THREADS
  unsigned n_threads =
      std::min<unsigned>(std::thread::hardware_concurrency(), unsigned(b));
  if (n_threads <= 1) {
    for (Py_ssize_t i = 0; i < b; ++i)
      fill_event(events[i], out_data + i * stride, max_voxels, dims, ndim,
                 normalize != 0, aug, uint64_t(i));
  } else {
    std::atomic<Py_ssize_t> next(0);
    std::vector<std::thread> pool;
    for (unsigned t = 0; t < n_threads; ++t) {
      pool.emplace_back([&]() {
        for (;;) {
          Py_ssize_t i = next.fetch_add(1);
          if (i >= b) return;
          fill_event(events[i], out_data + i * stride, max_voxels, dims,
                     ndim, normalize != 0, aug, uint64_t(i));
        }
      });
    }
    for (auto& th : pool) th.join();
  }
  Py_END_ALLOW_THREADS

  for (auto* h : holds) Py_DECREF(h);
  return (PyObject*)out;
}

PyMethodDef methods[] = {
    {"assemble_sparse_batch", (PyCFunction)assemble_sparse_batch,
     METH_VARARGS | METH_KEYWORDS,
     "Threaded event->padded-COO batch assembly (larcv BatchFiller "
     "equivalent).\n"
     "assemble_sparse_batch(events, max_voxels, dims, normalize=True,\n"
     "    augment=False, blur_sigma=0.05, translate=None, seed=0)\n"
     "events: list of (ids uint64[n], values float32[n]); returns\n"
     "float32[B, max_voxels, D+1] with -999 padding."},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_hostio",
                         "Native host IO pipeline", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__hostio(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
