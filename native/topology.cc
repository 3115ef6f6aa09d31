// Native model-preprocessing kernels for mujoco_tpu's put_model.
//
// Counterpart of the reference's C++ model-compiler layer
// (/root/reference/src/user/user_model.cc — the graph-building half of
// mjCModel::Compile): the static topology metadata that the TPU runtime
// bakes into pytree aux data is computed here in C instead of Python loops,
// which matters for large scenes (the Python fallback is O(nbody·depth +
// ngeom²) interpreted).
//
// Exposed functions (all operate on int32 numpy arrays):
//   tree_masks(parentid, body_dofadr, body_dofnum, dof_parentid, nv)
//     → (ancestor_mask u8 (nbody,nv), subtree_mask u8 (nbody,nbody),
//        dof_anc u8 (nv,nv), dof_depth i32 (nv,), body_depth i32 (nbody,))
//   candidate_pairs(geom_bodyid, geom_contype, geom_conaffinity,
//                   body_weldid, body_parentid, exclude_signatures,
//                   filterparent) → (npair, 2) i32 geom pairs
//
// Built as a plain CPython extension (no pybind11 per the environment);
// python side: mujoco_tpu/native_ext.py handles build + fallback.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

namespace {

const int32_t* as_i32(PyObject* obj, PyArrayObject** keep) {
  *keep = (PyArrayObject*)PyArray_FROM_OTF(obj, NPY_INT32,
                                           NPY_ARRAY_IN_ARRAY);
  if (!*keep) return nullptr;
  return (const int32_t*)PyArray_DATA(*keep);
}

PyObject* tree_masks(PyObject*, PyObject* args) {
  PyObject *o_parent, *o_dofadr, *o_dofnum, *o_dofparent;
  int nv;
  if (!PyArg_ParseTuple(args, "OOOOi", &o_parent, &o_dofadr, &o_dofnum,
                        &o_dofparent, &nv)) {
    return nullptr;
  }
  PyArrayObject *a1, *a2, *a3, *a4;
  const int32_t* parent = as_i32(o_parent, &a1);
  const int32_t* dofadr = as_i32(o_dofadr, &a2);
  const int32_t* dofnum = as_i32(o_dofnum, &a3);
  const int32_t* dofparent = as_i32(o_dofparent, &a4);
  if (!parent || !dofadr || !dofnum || !dofparent) return nullptr;
  npy_intp nbody = PyArray_DIM(a1, 0);

  npy_intp dims_anc[2] = {nbody, nv};
  npy_intp dims_sub[2] = {nbody, nbody};
  npy_intp dims_danc[2] = {nv, nv};
  npy_intp dims_dd[1] = {nv};
  npy_intp dims_bd[1] = {nbody};
  PyArrayObject* anc =
      (PyArrayObject*)PyArray_ZEROS(2, dims_anc, NPY_UINT8, 0);
  PyArrayObject* sub =
      (PyArrayObject*)PyArray_ZEROS(2, dims_sub, NPY_UINT8, 0);
  PyArrayObject* danc =
      (PyArrayObject*)PyArray_ZEROS(2, dims_danc, NPY_UINT8, 0);
  PyArrayObject* ddep =
      (PyArrayObject*)PyArray_ZEROS(1, dims_dd, NPY_INT32, 0);
  PyArrayObject* bdep =
      (PyArrayObject*)PyArray_ZEROS(1, dims_bd, NPY_INT32, 0);
  uint8_t* anc_d = (uint8_t*)PyArray_DATA(anc);
  uint8_t* sub_d = (uint8_t*)PyArray_DATA(sub);
  uint8_t* danc_d = (uint8_t*)PyArray_DATA(danc);
  int32_t* ddep_d = (int32_t*)PyArray_DATA(ddep);
  int32_t* bdep_d = (int32_t*)PyArray_DATA(bdep);

  // body depth + ancestor dof mask: walk each body's parent chain once,
  // reusing the parent's row (parents always precede children).
  for (npy_intp b = 1; b < nbody; ++b) {
    int32_t p = parent[b];
    bdep_d[b] = bdep_d[p] + 1;
    std::memcpy(anc_d + b * nv, anc_d + p * nv, nv);
    for (int32_t k = dofadr[b]; k < dofadr[b] + dofnum[b]; ++k) {
      anc_d[b * nv + k] = 1;
    }
  }
  // subtree mask: reverse sweep or-ing each row into its parent.
  for (npy_intp b = nbody - 1; b >= 0; --b) {
    sub_d[b * nbody + b] = 1;
    if (b > 0) {
      uint8_t* pr = sub_d + parent[b] * nbody;
      const uint8_t* cr = sub_d + b * nbody;
      for (npy_intp c = 0; c < nbody; ++c) pr[c] |= cr[c];
    }
  }
  // dof ancestor mask + dof depth (dof parents precede children too).
  for (int i = 0; i < nv; ++i) {
    int32_t p = dofparent[i];
    if (p >= 0) {
      std::memcpy(danc_d + (npy_intp)i * nv, danc_d + (npy_intp)p * nv, nv);
      ddep_d[i] = ddep_d[p] + 1;
    }
    danc_d[(npy_intp)i * nv + i] = 1;
  }

  PyObject* out = Py_BuildValue("(NNNNN)", anc, sub, danc, ddep, bdep);
  Py_DECREF(a1);
  Py_DECREF(a2);
  Py_DECREF(a3);
  Py_DECREF(a4);
  return out;
}

PyObject* candidate_pairs(PyObject*, PyObject* args) {
  PyObject *o_gbody, *o_contype, *o_conaff, *o_weld, *o_parent, *o_excl;
  int filterparent;
  if (!PyArg_ParseTuple(args, "OOOOOOi", &o_gbody, &o_contype, &o_conaff,
                        &o_weld, &o_parent, &o_excl, &filterparent)) {
    return nullptr;
  }
  PyArrayObject *a1, *a2, *a3, *a4, *a5, *a6;
  const int32_t* gbody = as_i32(o_gbody, &a1);
  const int32_t* contype = as_i32(o_contype, &a2);
  const int32_t* conaff = as_i32(o_conaff, &a3);
  const int32_t* weld = as_i32(o_weld, &a4);
  const int32_t* parent = as_i32(o_parent, &a5);
  const int32_t* excl = as_i32(o_excl, &a6);
  if (!gbody || !contype || !conaff || !weld || !parent || !excl) {
    return nullptr;
  }
  npy_intp ngeom = PyArray_DIM(a1, 0);
  npy_intp nbody = PyArray_DIM(a4, 0);
  npy_intp nexcl = PyArray_DIM(a6, 0);

  std::vector<int32_t> weldparent(nbody);
  for (npy_intp b = 0; b < nbody; ++b) {
    weldparent[b] = weld[parent[weld[b]]];
  }

  std::vector<int32_t> pairs;
  pairs.reserve(256);
  for (npy_intp g1 = 0; g1 < ngeom; ++g1) {
    for (npy_intp g2 = g1 + 1; g2 < ngeom; ++g2) {
      int32_t b1 = gbody[g1], b2 = gbody[g2];
      int32_t w1 = weld[b1], w2 = weld[b2];
      if (w1 == w2) continue;
      if (filterparent && w1 != 0 && w2 != 0 &&
          (weldparent[b1] == w2 || weldparent[b2] == w1)) {
        continue;
      }
      if (!((contype[g1] & conaff[g2]) || (contype[g2] & conaff[g1]))) {
        continue;
      }
      int32_t lo = b1 < b2 ? b1 : b2;
      int32_t hi = b1 < b2 ? b2 : b1;
      int32_t sig = (lo << 16) + hi;
      bool excluded = false;
      for (npy_intp e = 0; e < nexcl; ++e) {
        if (excl[e] == sig) {
          excluded = true;
          break;
        }
      }
      if (excluded) continue;
      pairs.push_back((int32_t)g1);
      pairs.push_back((int32_t)g2);
    }
  }

  npy_intp dims[2] = {(npy_intp)(pairs.size() / 2), 2};
  PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(2, dims, NPY_INT32);
  if (!pairs.empty()) {
    std::memcpy(PyArray_DATA(out), pairs.data(),
                pairs.size() * sizeof(int32_t));
  }
  Py_DECREF(a1);
  Py_DECREF(a2);
  Py_DECREF(a3);
  Py_DECREF(a4);
  Py_DECREF(a5);
  Py_DECREF(a6);
  return (PyObject*)out;
}

PyMethodDef methods[] = {
    {"tree_masks", tree_masks, METH_VARARGS,
     "Dense tree topology masks from parent tables."},
    {"candidate_pairs", candidate_pairs, METH_VARARGS,
     "Enumerate collision candidate geom pairs."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_mjtpu_topology",
    "Native model-preprocessing kernels for mujoco_tpu.", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__mjtpu_topology(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
