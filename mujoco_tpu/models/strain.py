"""mjEQ_FLEXSTRAIN model construction shim (volume mode).

The reference's 3.11 compiler turns `<flexcomp dof="trilinear|quadratic">
<edge equality="strain"/>` into per-cell strain equalities and replaces the
flex's raw FEM stiffness with the eigen format
[neig | sqrt(λ)·v_1 | ... ] per ndof² block, using young=10/poisson=0.3
(geometry-only eigenvectors — EigendecomposeStiffness,
/root/reference/src/user/user_mesh.cc:4127-4167, strain equality creation
user_flexcomp.cc:760-805). The pip compiler (3.10) predates the feature, so
this module performs exactly that transformation on a pip-compiled model:

    mjm = mujoco.MjModel.from_xml_string(xml)   # flexcomp with
                                                # <elasticity young=..
                                                #  poisson="0.3"/>
    mjm2 = strain.with_strain_constraints(mjm)  # -> put_model(mjm2)

Requirements: the flex must be interpolated (dof trilinear/quadratic) and
compiled with poisson = 0.3 (eigenvectors depend on Poisson's ratio; the
sqrt(λ) scale is corrected to young = 10 analytically since K is linear in
young). Shell (elastic2d) strain mode is not implemented.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

_STRAIN_YOUNG = 10.0        # reference K_young for strain constraints
_STRAIN_POISSON = 0.3


class _StrainModel:
  """Attribute-passthrough wrapper with the strain-mode overrides."""

  def __init__(self, mjm: Any, overrides: dict):
    self._mjm = mjm
    self._ov = overrides

  def __getattr__(self, name):
    ov = object.__getattribute__(self, "_ov")
    if name in ov:
      return ov[name]
    return getattr(object.__getattribute__(self, "_mjm"), name)


def _eigendecompose(block: np.ndarray, ndof: int) -> np.ndarray:
  """EigendecomposeStiffness (user_mesh.cc:4135): block stores -K_physical;
  returns the [neig | sqrt(λ)·vᵀ ...] format in an ndof² buffer."""
  k = block.reshape(ndof, ndof)
  eigval, eigvec = np.linalg.eigh(0.5 * (k + k.T))
  lam_phys = -eigval                       # K_stored = -K_physical
  threshold = np.abs(eigval).max() * 1e-8
  out = np.zeros(ndof * ndof)
  neig = 0
  # eigh returns ascending eigval → descending λ_phys; the reference's
  # LAPACK wrapper emits ascending eigval too, iterated in order
  for i in range(ndof):
    if lam_phys[i] > threshold:
      out[1 + neig * ndof:1 + (neig + 1) * ndof] = (
          np.sqrt(lam_phys[i]) * eigvec[:, i])
      neig += 1
  out[0] = float(neig)
  return out


def with_strain_constraints(mjm: Any,
                            flexes: Optional[Sequence[int]] = None) -> Any:
  """Return a model view with per-cell mjEQ_FLEXSTRAIN equalities replacing
  the passive FEM elasticity of the given interpolated flexes (default:
  every interpolated flex with a stiffness table)."""
  nflex = int(mjm.nflex)
  interp = np.asarray(getattr(mjm, "flex_interp", np.zeros(nflex)),
                      dtype=int)
  stiffadr = np.asarray(mjm.flex_stiffnessadr, dtype=np.int64)
  if flexes is None:
    flexes = [f for f in range(nflex) if interp[f] >= 1 and stiffadr[f] >= 0]
  if not flexes:
    raise ValueError("no interpolated flexes with stiffness tables")

  stiff = np.array(mjm.flex_stiffness, dtype=np.float64, copy=True)
  cellnum = np.asarray(mjm.flex_cellnum).reshape(nflex, 3).astype(int)
  edgeeq = np.array(mjm.flex_edgeequality, dtype=np.int32, copy=True)
  poisson = (np.asarray(mjm.flex_poisson, dtype=np.float64)
             if hasattr(mjm, "flex_poisson") else None)
  young = (np.asarray(mjm.flex_young, dtype=np.float64)
           if hasattr(mjm, "flex_young") else None)

  new_eq = []                    # (obj1, data3) per strain equality
  for f in flexes:
    if interp[f] < 1:
      raise ValueError(f"flex {f} is not interpolated")
    order = int(interp[f])
    npe = (order + 1) ** 3
    ndof = 3 * npe
    cx, cy, cz = (int(x) for x in cellnum[f])
    if young is not None and young.size:
      scale2 = _STRAIN_YOUNG / float(young[f])
      if poisson is not None and poisson.size and \
         abs(float(poisson[f]) - _STRAIN_POISSON) > 1e-12:
        raise ValueError(
            f"flex {f}: strain constraints need poisson = {_STRAIN_POISSON}"
            " (eigenvectors are Poisson-dependent)")
    else:
      # pip 3.10 does not expose flex_young/poisson: the XML author must
      # compile with young=10 poisson=0.3 (documented contract)
      scale2 = 1.0
    for fe in range(cx * cy * cz):
      a = stiffadr[f] + fe * ndof * ndof
      block = stiff[a:a + ndof * ndof]
      if not block.any():
        continue                  # empty cell
      eig = _eigendecompose(block * scale2, ndof)
      stiff[a:a + ndof * ndof] = eig
      if int(eig[0]) == 0:
        continue
      ci, cj, ck = fe // (cy * cz), (fe // cz) % cy, fe % cz
      new_eq.append((f, (float(ci), float(cj), float(ck))))
    edgeeq[f] = 3

  neq0 = int(mjm.neq)
  neq = neq0 + len(new_eq)
  ndata = np.asarray(mjm.eq_data).reshape(neq0, -1).shape[1] if neq0 \
      else 11
  eq_type = np.concatenate([np.asarray(mjm.eq_type, dtype=np.int32),
                            np.full(len(new_eq), 6, dtype=np.int32)])
  eq_obj1id = np.concatenate([np.asarray(mjm.eq_obj1id, dtype=np.int32),
                              np.array([e[0] for e in new_eq],
                                       dtype=np.int32)])
  eq_obj2id = np.concatenate([np.asarray(mjm.eq_obj2id, dtype=np.int32),
                              np.full(len(new_eq), -1, dtype=np.int32)])
  eq_objtype = np.concatenate([np.asarray(mjm.eq_objtype, dtype=np.int32),
                               np.zeros(len(new_eq), dtype=np.int32)])
  data_new = np.zeros((len(new_eq), ndata))
  for k, (_, d3) in enumerate(new_eq):
    data_new[k, :3] = d3
  eq_data = np.concatenate(
      [np.asarray(mjm.eq_data, dtype=np.float64).reshape(neq0, ndata),
       data_new])
  eq_active0 = np.concatenate([np.asarray(mjm.eq_active0, dtype=np.int32),
                               np.ones(len(new_eq), dtype=np.int32)])
  solref = np.asarray(mjm.eq_solref, dtype=np.float64).reshape(neq0, 2)
  solimp = np.asarray(mjm.eq_solimp, dtype=np.float64).reshape(neq0, 5)
  eq_solref = np.concatenate(
      [solref, np.tile([0.02, 1.0], (len(new_eq), 1))])
  eq_solimp = np.concatenate(
      [solimp, np.tile([0.9, 0.95, 0.001, 0.5, 2.0], (len(new_eq), 1))])

  return _StrainModel(mjm, dict(
      neq=neq, eq_type=eq_type, eq_obj1id=eq_obj1id, eq_obj2id=eq_obj2id,
      eq_objtype=eq_objtype, eq_data=eq_data, eq_active0=eq_active0,
      eq_solref=eq_solref, eq_solimp=eq_solimp,
      flex_stiffness=stiff, flex_edgeequality=edgeeq))
