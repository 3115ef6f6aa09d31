"""put_model / make_data: build TPU pytrees from a compiled reference model.

Strategy per SURVEY.md §7.1 and the reference's own layering (MJX sits on the
C compiler via put_model, /root/reference/mjx/mujoco/mjx/_src/io.py): v0
consumes a compiled ``mujoco.MjModel`` from the pip package, converting it
into our static/dynamic pytree split plus precomputed dense topology masks,
a fixed contact-slot layout, and a fixed constraint-row layout. A native
MJCF compiler is a later layer.
"""

from __future__ import annotations

import os
from typing import Any

import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import (BiasType, ConeType, Contact, ContactMeta,
                                     Data, DisableBit, DynType, EfcMeta,
                                     EnableBit, EqType, GainType, GeomType,
                                     JointType, Model, Option, TreeTopology)

# Contact capacity per (type1, type2) pair — the static slot budget each
# candidate geom pair owns. Sized to the reference narrowphase's maximums
# (mjCOLLISIONFUNC table, /root/reference/src/engine/engine_collision_driver.c:45).
# Only pairs with an implemented collider are listed; others raise at
# put_model time (ops/collision_driver._COLLIDERS is the matching registry).
_PAIR_NCON = {
    (GeomType.PLANE, GeomType.SPHERE): 1,
    (GeomType.PLANE, GeomType.CAPSULE): 2,
    (GeomType.PLANE, GeomType.ELLIPSOID): 1,
    (GeomType.PLANE, GeomType.CYLINDER): 4,
    (GeomType.PLANE, GeomType.BOX): 4,
    (GeomType.SPHERE, GeomType.SPHERE): 1,
    (GeomType.SPHERE, GeomType.CAPSULE): 1,
    (GeomType.SPHERE, GeomType.CYLINDER): 1,
    (GeomType.SPHERE, GeomType.BOX): 1,
    (GeomType.CAPSULE, GeomType.CAPSULE): 2,
    (GeomType.CAPSULE, GeomType.BOX): 3,
    (GeomType.BOX, GeomType.BOX): 8,
    (GeomType.HFIELD, GeomType.SPHERE): 3,
    (GeomType.HFIELD, GeomType.CAPSULE): 3,
    (GeomType.HFIELD, GeomType.BOX): 4,
    (GeomType.HFIELD, GeomType.CYLINDER): 4,
    (GeomType.HFIELD, GeomType.ELLIPSOID): 4,
    (GeomType.HFIELD, GeomType.MESH): 4,
    (GeomType.PLANE, GeomType.MESH): 4,
    (GeomType.SPHERE, GeomType.MESH): 1,
    (GeomType.CAPSULE, GeomType.MESH): 3,
}


def _mesh_hulls(mjm: Any) -> tuple:
  """Per-mesh convex-hull vertex ids (global rows of mesh_vert), decimated
  to MJTPU_MAX_HULL_VERT by greedy farthest-point sampling — the TPU-side
  analog of the compiler's qhull graph + maxhullvert decimation
  (/root/reference/src/user/user_mesh.cc MakeGraph/maxhullvert)."""
  nmesh = len(np.asarray(mjm.mesh_vertadr))
  cap = int(os.environ.get("MJTPU_MAX_HULL_VERT", "64"))
  verts_all = np.asarray(mjm.mesh_vert, dtype=np.float64)
  hulls = []
  for i in range(nmesh):
    va, vn = int(mjm.mesh_vertadr[i]), int(mjm.mesh_vertnum[i])
    v = verts_all[va:va + vn]
    try:
      from scipy.spatial import ConvexHull
      idx = np.unique(np.asarray(ConvexHull(v).vertices, dtype=np.int64))
    except Exception:                     # degenerate/flat meshes: keep all
      idx = np.arange(vn, dtype=np.int64)
    if len(idx) > cap:
      pts = v[idx]
      keep = [int(np.argmax(pts[:, 0]))]
      dist = np.full(len(pts), np.inf)
      for _ in range(cap - 1):
        dist = np.minimum(dist,
                          np.linalg.norm(pts - pts[keep[-1]], axis=1))
        keep.append(int(np.argmax(dist)))
      idx = idx[np.array(sorted(set(keep)), dtype=np.int64)]
    hulls.append((va + idx).astype(np.int32))
  return tuple(hulls)


def _vis_meta_of(mjm: Any) -> dict:
  """Visualization constants for the mjv-lite scene export (mjVisual +
  mjStatistic subset; defaults match mj_defaultVisual for compiler-path
  models without a vis block)."""
  vis = getattr(mjm, "vis", None)
  stat = getattr(mjm, "stat", None)
  g = lambda o, path, dv: dv if o is None else float(
      np.asarray(_attr_path(o, path, dv)).ravel()[0])
  return dict(
      meansize=g(stat, ("meansize",), 0.2),
      meanmass=g(stat, ("meanmass",), 1.0),
      contactwidth=g(vis, ("scale", "contactwidth"), 0.3),
      contactheight=g(vis, ("scale", "contactheight"), 0.1),
      forcewidth=g(vis, ("scale", "forcewidth"), 0.1),
      map_force=g(vis, ("map", "force"), 0.005),
      rgba_contactpoint=tuple(np.asarray(
          _attr_path(vis, ("rgba", "contactpoint"), (0.9, 0.6, 0.2, 1.0)),
          dtype=np.float64).tolist()) if vis is not None
      else (0.9, 0.6, 0.2, 1.0),
      rgba_contactforce=tuple(np.asarray(
          _attr_path(vis, ("rgba", "contactforce"), (0.7, 0.9, 0.9, 1.0)),
          dtype=np.float64).tolist()) if vis is not None
      else (0.7, 0.9, 0.9, 1.0),
      # headlight (mjVisual.headlight defaults, engine_init.c:157-165)
      headlight_active=int(g(vis, ("headlight", "active"), 1)),
      headlight_ambient=tuple(np.broadcast_to(np.asarray(_attr_path(
          vis, ("headlight", "ambient"), 0.1), dtype=np.float64), 3).tolist()),
      headlight_diffuse=tuple(np.broadcast_to(np.asarray(_attr_path(
          vis, ("headlight", "diffuse"), 0.4), dtype=np.float64), 3).tolist()),
      headlight_specular=tuple(np.broadcast_to(np.asarray(_attr_path(
          vis, ("headlight", "specular"), 0.5), dtype=np.float64),
          3).tolist()),
  )


def _render_fields(mjm: Any, jx, si) -> dict:
  """Material / texture / light-photometry model fields (mjmodel.h mat_*,
  tex_*, light_*). Sources that predate these arrays (older CompiledModels)
  get MJCF-default lights and an empty material/texture table. tex_data is
  normalized to a flat [0, 1] RGB stream; 4-channel textures are repacked
  to RGB (alpha is not consumed by the shader)."""
  nl = int(mjm.nlight)
  nmat = int(getattr(mjm, "nmat", 0))
  ntex = int(getattr(mjm, "ntex", 0))
  ngeom = int(mjm.ngeom)
  g = lambda name, dv: np.asarray(getattr(mjm, name, dv))
  # MJCF light defaults (mjs_defaultLight, user_init.c): spot, active,
  # castshadow, diffuse .7, specular .3, attenuation (1,0,0), cutoff 45,
  # exponent 10
  out = dict(
      light_type=si(g("light_type", np.zeros(nl, dtype=np.int32))),
      light_active=g("light_active", np.ones(nl, dtype=bool)).astype(bool),
      light_castshadow=g("light_castshadow",
                         np.ones(nl, dtype=bool)).astype(bool),
      light_ambient=jx(g("light_ambient", np.zeros((nl, 3)))),
      light_diffuse=jx(g("light_diffuse", np.full((nl, 3), 0.7))),
      light_specular=jx(g("light_specular", np.full((nl, 3), 0.3))),
      light_attenuation=jx(g("light_attenuation",
                             np.tile([1.0, 0, 0], (nl, 1)))),
      light_cutoff=jx(g("light_cutoff", np.full(nl, 45.0))),
      light_exponent=jx(g("light_exponent", np.full(nl, 10.0))),
      nmat=nmat, ntex=ntex,
      geom_matid=si(g("geom_matid", np.full(ngeom, -1, dtype=np.int32))),
      mat_texuniform=g("mat_texuniform",
                       np.zeros(nmat, dtype=bool)).astype(bool),
      mat_texrepeat=jx(g("mat_texrepeat", np.ones((nmat, 2)))),
      mat_rgba=jx(g("mat_rgba", np.ones((nmat, 4)))),
      mat_emission=jx(g("mat_emission", np.zeros(nmat))),
      mat_specular=jx(g("mat_specular", np.full(nmat, 0.5))),
      mat_shininess=jx(g("mat_shininess", np.full(nmat, 0.5))),
      mat_reflectance=jx(g("mat_reflectance", np.zeros(nmat))),
  )
  # mat_texid: RGB role column when the source carries per-role columns
  # (mjNTEXROLE, mjTEXROLE_RGB == 1), else the flat array
  mt = np.asarray(getattr(mjm, "mat_texid",
                          np.full(nmat, -1, dtype=np.int32)))
  out["mat_texid"] = si(mt[:, 1] if mt.ndim == 2 else mt)
  # textures, repacked to 3 channels
  ttype = np.asarray(getattr(mjm, "tex_type",
                             np.zeros(ntex, dtype=np.int32)), dtype=np.int32)
  tw = np.asarray(getattr(mjm, "tex_width",
                          np.zeros(ntex, dtype=np.int32)), dtype=np.int32)
  th = np.asarray(getattr(mjm, "tex_height",
                          np.zeros(ntex, dtype=np.int32)), dtype=np.int32)
  tadr_src = np.asarray(getattr(mjm, "tex_adr",
                                np.zeros(ntex, dtype=np.int64)))
  nchan = np.asarray(getattr(mjm, "tex_nchannel",
                             np.full(ntex, 3, dtype=np.int32)))
  src = np.asarray(getattr(mjm, "tex_data", np.zeros(0, dtype=np.uint8)))
  if src.dtype == np.uint8:
    src = src.astype(np.float64) / 255.0
  adr = np.zeros(ntex, dtype=np.int64)
  chunks = []
  off = 0
  for t in range(ntex):
    npix = int(tw[t]) * int(th[t])
    c = int(nchan[t])
    block = src[int(tadr_src[t]):int(tadr_src[t]) + npix * c]
    block = block.reshape(npix, c)[:, :3]
    if c < 3:  # grayscale: broadcast
      block = np.repeat(block[:, :1], 3, axis=1)
    adr[t] = off
    chunks.append(block.ravel())
    off += npix * 3
  out["tex_type"] = si(ttype)
  out["tex_adr"] = adr
  out["tex_width"] = si(tw)
  out["tex_height"] = si(th)
  out["tex_data"] = jx(np.concatenate(chunks) if chunks
                       else np.zeros(0, dtype=np.float64))
  # skins (mjmodel.h skin_*); counts derived from the arrays so sources
  # without nskinvert/nskinface/nskinbone headers (CompiledModel) work
  nskin = int(getattr(mjm, "nskin", 0))
  nsv = np.asarray(getattr(mjm, "skin_vert", np.zeros((0, 3)))).size // 3
  nsf = np.asarray(getattr(mjm, "skin_face",
                           np.zeros((0, 3), dtype=np.int32))).size // 3
  nsb = np.asarray(getattr(mjm, "skin_bonebodyid",
                           np.zeros(0, dtype=np.int32))).size
  nsbv = np.asarray(getattr(mjm, "skin_bonevertid",
                            np.zeros(0, dtype=np.int32))).size
  out.update(
      nskin=nskin,
      skin_matid=si(g("skin_matid", np.full(nskin, -1, dtype=np.int32))),
      skin_group=si(g("skin_group", np.zeros(nskin, dtype=np.int32))),
      skin_rgba=jx(g("skin_rgba", np.ones((nskin, 4)))),
      skin_inflate=jx(g("skin_inflate", np.zeros(nskin))),
      skin_vertadr=si(g("skin_vertadr", np.zeros(nskin, dtype=np.int32))),
      skin_vertnum=si(g("skin_vertnum", np.zeros(nskin, dtype=np.int32))),
      skin_faceadr=si(g("skin_faceadr", np.zeros(nskin, dtype=np.int32))),
      skin_facenum=si(g("skin_facenum", np.zeros(nskin, dtype=np.int32))),
      skin_boneadr=si(g("skin_boneadr", np.zeros(nskin, dtype=np.int32))),
      skin_bonenum=si(g("skin_bonenum", np.zeros(nskin, dtype=np.int32))),
      skin_vert=jx(g("skin_vert", np.zeros((nsv, 3))).reshape(nsv, 3)),
      skin_face=si(g("skin_face",
                     np.zeros((nsf, 3), dtype=np.int32)).reshape(nsf, 3)),
      skin_bonevertadr=si(g("skin_bonevertadr",
                            np.zeros(nsb, dtype=np.int32))),
      skin_bonevertnum=si(g("skin_bonevertnum",
                            np.zeros(nsb, dtype=np.int32))),
      skin_bonebodyid=si(g("skin_bonebodyid",
                           np.zeros(nsb, dtype=np.int32))),
      skin_bonebindpos=jx(g("skin_bonebindpos",
                            np.zeros((nsb, 3))).reshape(nsb, 3)),
      skin_bonebindquat=jx(g("skin_bonebindquat",
                             np.zeros((nsb, 4))).reshape(nsb, 4)),
      skin_bonevertid=si(g("skin_bonevertid",
                           np.zeros(nsbv, dtype=np.int32))),
      skin_bonevertweight=jx(g("skin_bonevertweight", np.zeros(nsbv))),
  )
  return out


def _attr_path(obj, path, default):
  for p in path:
    if obj is None or not hasattr(obj, p):
      return default
    obj = getattr(obj, p)
  return obj


def _user_callbacks() -> tuple:
  """Snapshot the mjcb_* analog registry (mujoco_tpu/plugin.py) into static
  Model metadata so jit keys on the callables."""
  from mujoco_tpu import plugin
  return plugin.resolve()


def _plugin_name(mjm: Any, instance: int) -> str:
  """Resolve the registered plugin-type name for an instance via the
  process-global plugin table (mjp_getPluginAtSlot; the pip bindings do not
  expose it, so go through ctypes on the bundled library)."""
  import ctypes
  import glob
  import mujoco
  libs = glob.glob(os.path.join(os.path.dirname(mujoco.__file__),
                                "libmujoco*"))
  lib = ctypes.CDLL(libs[0])
  lib.mjp_getPluginAtSlot.restype = ctypes.c_void_p
  p = lib.mjp_getPluginAtSlot(int(mjm.plugin[instance]))
  if not p:
    raise NotImplementedError(f"plugin instance {instance}: empty slot")
  name = ctypes.cast(ctypes.cast(p, ctypes.POINTER(ctypes.c_void_p))[0],
                     ctypes.c_char_p).value
  return name.decode()


def _sdf_geom_info(mjm: Any, g: int):
  """(kind, params) for one side of an SDF pair: int GeomType for
  primitives, (plugin name, attribute vector) for mjGEOM_SDF geoms."""
  from mujoco_tpu.ops import sdf as sdfmod
  t = int(mjm.geom_type[g])
  if t != int(GeomType.SDF):
    return t, None
  instance = int(mjm.geom_plugin[g])
  if instance < 0:
    # mesh-backed SDF geom: dense signed-distance grid precomputed from
    # the mesh — the TPU analog of the reference's per-mesh octree
    # (user_mesh.cc:488,784; collided in engine_collision_sdf.c)
    mid = int(mjm.geom_dataid[g])
    if mid < 0:
      raise NotImplementedError(f"SDF geom {g}: no plugin and no mesh")
    va, vn = int(mjm.mesh_vertadr[mid]), int(mjm.mesh_vertnum[mid])
    fa, fn = int(mjm.mesh_faceadr[mid]), int(mjm.mesh_facenum[mid])
    verts = np.asarray(mjm.mesh_vert).reshape(-1, 3)[va:va + vn]
    faces = np.asarray(mjm.mesh_face).reshape(-1, 3)[fa:fa + fn]
    cache = _sdf_geom_info.__dict__.setdefault("_grid_cache", {})
    key = (id(mjm), mid)
    hit = cache.get(key)
    if hit is None or hit[0] is not mjm:
      hit = (mjm, sdfmod.mesh_grid_sdf(verts, faces))
      cache[key] = hit
    return sdfmod.MESH_GRID, hit[1]
  name = _plugin_name(mjm, instance)
  if name not in sdfmod.PLUGIN_SDF:
    raise NotImplementedError(f"SDF plugin {name!r}")
  _, attr_names, defaults = sdfmod.PLUGIN_SDF[name]
  # plugin_attr stores each declared attribute's config value (possibly
  # empty) as consecutive C strings starting at plugin_attradr[instance]
  blob = bytes(np.asarray(mjm.plugin_attr, dtype=np.uint8))
  vals = blob[int(mjm.plugin_attradr[instance]):].split(b"\x00")
  params = []
  for i in range(len(attr_names)):
    v = vals[i].decode() if i < len(vals) else ""
    params.append(float(v) if v.strip() else float(defaults[i]))
  return name, np.asarray(params, dtype=np.float64)


def _tree_topology(parentid: np.ndarray, dof_bodyid: np.ndarray,
                   dof_parentid: np.ndarray, body_dofadr: np.ndarray,
                   body_dofnum: np.ndarray, nv: int,
                   dof_jntid: np.ndarray, jnt_type: np.ndarray,
                   jnt_dofadr: np.ndarray) -> TreeTopology:
  nbody = len(parentid)

  # native fast path (C extension, native/topology.cc — the graph-builder
  # half of the reference's C++ compiler layer); pure-python fallback below
  from mujoco_tpu import native_ext
  nat = native_ext.get()
  if nat is not None:
    anc_u8, sub_u8, danc_u8, dof_depth_nat, body_depth = nat.tree_masks(
        np.asarray(parentid, dtype=np.int32),
        np.asarray(body_dofadr, dtype=np.int32),
        np.asarray(body_dofnum, dtype=np.int32),
        np.asarray(dof_parentid, dtype=np.int32), int(nv))
    ancestor_mask = anc_u8.astype(bool)
    subtree_mask = sub_u8.astype(bool)
    dof_anc = danc_u8.astype(bool)
    depth = body_depth
  else:
    depth = np.zeros(nbody, dtype=np.int32)
    for b in range(1, nbody):
      depth[b] = depth[parentid[b]] + 1

    # ancestor_mask[b, v]: dof v is on the path from the root to body b.
    ancestor_mask = np.zeros((nbody, nv), dtype=bool)
    for b in range(1, nbody):
      p = b
      while p != 0:
        adr, num = body_dofadr[p], body_dofnum[p]
        if num > 0:
          ancestor_mask[b, adr:adr + num] = True
        p = parentid[p]

    subtree_mask = np.zeros((nbody, nbody), dtype=bool)
    for b in range(nbody - 1, -1, -1):
      subtree_mask[b, b] = True
      if b > 0:
        subtree_mask[parentid[b]] |= subtree_mask[b]

    # dof_ancestor_mask[i, j]: dof j is an ancestor of dof i or i itself —
    # exactly the sparsity pattern of the reference's sparse M (dof_parentid
    # chains, engine_core_smooth.c mj_crb).
    dof_anc = np.zeros((nv, nv), dtype=bool)
    for i in range(nv):
      j = i
      while j >= 0:
        dof_anc[i, j] = True
        j = dof_parentid[j]

  levels = tuple(
      np.nonzero(depth == lev)[0].astype(np.int32)
      for lev in range(1, depth.max() + 1 if nbody > 1 else 1))

  # cdofdot_mask: which dof velocities rotate dof j's motion axis — see
  # TreeTopology docstring; reproduces mj_comVel's accumulation order.
  cdofdot_mask = np.zeros((nv, nv), dtype=bool)
  for j in range(nv):
    jid = dof_jntid[j]
    jtype = int(jnt_type[jid])
    off = j - jnt_dofadr[jid]  # dof index within its joint
    if jtype == JointType.FREE and off < 3:
      continue  # translation dofs: cdofdot identically zero
    k = dof_parentid[j]
    while k >= 0:
      cdofdot_mask[j, k] = True
      k = dof_parentid[k]
    if jtype == JointType.BALL:
      cdofdot_mask[j, jnt_dofadr[jid]:jnt_dofadr[jid] + 3] = False
    elif jtype == JointType.FREE:
      # exclude sibling rotations, keep own translations
      cdofdot_mask[j, jnt_dofadr[jid] + 3:jnt_dofadr[jid] + 6] = False

  # dof-tree depth levels + padded strict-ancestor chains (for tree-LDL)
  dof_depth = np.zeros(nv, dtype=np.int32)
  for i in range(nv):
    p = dof_parentid[i]
    dof_depth[i] = 0 if p < 0 else dof_depth[p] + 1
  dof_levels = tuple(
      np.nonzero(dof_depth == lev)[0].astype(np.int32)
      for lev in range(dof_depth.max() + 1 if nv else 0))
  maxdepth = int(dof_depth.max()) if nv else 0
  dof_anc_table = np.full((nv, max(maxdepth, 1)), nv, dtype=np.int32)
  for i in range(nv):
    p = dof_parentid[i]
    k = 0
    while p >= 0:
      dof_anc_table[i, k] = p
      p = dof_parentid[p]
      k += 1

  return TreeTopology(ancestor_mask=ancestor_mask, subtree_mask=subtree_mask,
                      levels=levels, dof_ancestor_mask=dof_anc,
                      cdofdot_mask=cdofdot_mask,
                      dof_levels=dof_levels, dof_anc_table=dof_anc_table)


def _contact_meta(mjm: Any) -> ContactMeta:
  """Enumerate candidate geom pairs, mirroring mj_collision's filtering
  (/root/reference/src/engine/engine_collision_driver.c:595-681):
  contype/conaffinity compatibility, same-weld exclusion, parent-child weld
  filtering (mjDSBL_FILTERPARENT), <exclude> signatures, explicit <pair>s.
  """
  filterparent = not (mjm.opt.disableflags & DisableBit.FILTERPARENT)
  exclude_sigs = set()
  for i in range(mjm.nexclude):
    exclude_sigs.add(int(mjm.exclude_signature[i]))

  weld = mjm.body_weldid
  weldparent = np.array([weld[mjm.body_parentid[weld[b]]]
                         for b in range(mjm.nbody)])

  pairs = []  # (g1, g2, pairid)
  explicit = set()
  for p in range(mjm.npair):
    g1, g2 = int(mjm.pair_geom1[p]), int(mjm.pair_geom2[p])
    if mjm.geom_type[g1] > mjm.geom_type[g2]:
      g1, g2 = g2, g1
    pairs.append((g1, g2, p))
    explicit.add((min(g1, g2), max(g1, g2)))

  from mujoco_tpu import native_ext
  nat = native_ext.get()
  if nat is not None:
    raw = nat.candidate_pairs(
        np.asarray(mjm.geom_bodyid, dtype=np.int32),
        np.asarray(mjm.geom_contype, dtype=np.int32),
        np.asarray(mjm.geom_conaffinity, dtype=np.int32),
        np.asarray(mjm.body_weldid, dtype=np.int32),
        np.asarray(mjm.body_parentid, dtype=np.int32),
        np.asarray(sorted(exclude_sigs), dtype=np.int32),
        int(filterparent))
    for g1, g2 in raw:
      g1, g2 = int(g1), int(g2)
      if (min(g1, g2), max(g1, g2)) in explicit:
        continue
      a, b = (g1, g2) if mjm.geom_type[g1] <= mjm.geom_type[g2] else (g2, g1)
      pairs.append((a, b, -1))
  else:
    for g1 in range(mjm.ngeom):
      for g2 in range(g1 + 1, mjm.ngeom):
        if (min(g1, g2), max(g1, g2)) in explicit:
          continue
        b1, b2 = int(mjm.geom_bodyid[g1]), int(mjm.geom_bodyid[g2])
        w1, w2 = int(weld[b1]), int(weld[b2])
        if w1 == w2:
          continue
        if filterparent and w1 != 0 and w2 != 0 and (
            weldparent[b1] == w2 or weldparent[b2] == w1):
          continue
        con1 = mjm.geom_contype[g1] & mjm.geom_conaffinity[g2]
        con2 = mjm.geom_contype[g2] & mjm.geom_conaffinity[g1]
        if not (con1 or con2):
          continue
        body_sig = (min(b1, b2) << 16) + max(b1, b2)
        if body_sig in exclude_sigs:
          continue
        a, b = (g1, g2) if mjm.geom_type[g1] <= mjm.geom_type[g2] \
            else (g2, g1)
        pairs.append((a, b, -1))

  convex = {GeomType.SPHERE, GeomType.CAPSULE, GeomType.ELLIPSOID,
            GeomType.CYLINDER, GeomType.BOX, GeomType.MESH}

  def pair_sig(g1, g2, pid):
    """(t1, t2, did1, did2, condim, ncontact) for a candidate pair."""
    t1, t2 = GeomType(mjm.geom_type[g1]), GeomType(mjm.geom_type[g2])
    key = (t1, t2)
    if t2 == GeomType.SDF:
      # SDF narrowphase: sdf_initpoints descent starts = slots per pair
      # (mj_maxContact, engine_collision_driver.c:70)
      if t1 in (GeomType.HFIELD, GeomType.MESH):
        raise NotImplementedError(f"{t1.name} vs SDF collision")
      n = int(mjm.opt.sdf_initpoints)
    elif key in _PAIR_NCON:
      n = _PAIR_NCON[key]
    elif t1 in convex and t2 in convex:
      # general convex pair → MPR + perturbed-support manifold
      from mujoco_tpu.ops.collision_convex import CONVEX_NCON
      n = CONVEX_NCON
    else:
      raise NotImplementedError(
          f"collision pair {t1.name}-{t2.name} (geoms {g1},{g2}) not yet "
          "supported")
    if pid >= 0:
      condim = int(mjm.pair_dim[pid])
    else:
      p1, p2 = int(mjm.geom_priority[g1]), int(mjm.geom_priority[g2])
      if p1 != p2:
        condim = int(mjm.geom_condim[g1 if p1 > p2 else g2])
      else:
        condim = int(max(mjm.geom_condim[g1], mjm.geom_condim[g2]))
    did1 = int(mjm.geom_dataid[g1]) if t1 in (GeomType.HFIELD,
                                              GeomType.MESH) else -1
    did2 = int(mjm.geom_dataid[g2]) if t2 == GeomType.MESH else -1
    return (int(t1), int(t2), did1, did2, condim), n

  # partition implicit non-plane/hfield pairs into signature groups; large
  # groups become DYNAMIC: a fixed budget of pair slots filled per step by
  # bounding-sphere-distance top-K (the fixed-shape broadphase cull —
  # mj_broadphase/SAP analog, engine_collision_driver.c:1572; precedent:
  # MJX max_geom_pairs, mjx/_src/collision_driver.py:405)
  pair_budget = int(os.environ.get("MJTPU_PAIR_BUDGET", "24"))
  dyn_threshold = max(2 * pair_budget, 16)
  staged = {}
  static_pairs = []
  for g1, g2, pid in pairs:
    sig, n = pair_sig(g1, g2, pid)
    t1 = sig[0]
    if pid >= 0 or t1 in (int(GeomType.PLANE), int(GeomType.HFIELD)) \
        or sig[1] == int(GeomType.SDF):
      static_pairs.append((g1, g2, pid, sig, n))
    else:
      staged.setdefault(sig, []).append((g1, g2))
  from mujoco_tpu.ops.collision_convex import CONVEX_NCON
  dyn_groups = []
  for sig, plist in sorted(staged.items()):
    if len(plist) > dyn_threshold:
      dyn_groups.append((sig, plist))
    else:
      static_pairs.extend((g1, g2, -1, sig, _PAIR_NCON.get(
          (GeomType(sig[0]), GeomType(sig[1])), CONVEX_NCON))
          for g1, g2 in plist)

  slot_g1, slot_g2, slot_types, slot_condim, slot_pairid = [], [], [], [], []
  slot_first = []
  sdf_meta = []
  for g1, g2, pid, sig, n in static_pairs:
    if sig[1] == int(GeomType.SDF):
      kind1, params1 = _sdf_geom_info(mjm, g1)
      kind2, params2 = _sdf_geom_info(mjm, g2)
      sdf_meta.append(dict(
          g1=g1, g2=g2, adr=len(slot_g1), n=n,
          iterations=int(mjm.opt.sdf_iterations),
          kind1=kind1, kind2=kind2, params1=params1, params2=params2,
          aabb1=np.array(mjm.geom_aabb[g1], dtype=np.float64),
          aabb2=np.array(mjm.geom_aabb[g2], dtype=np.float64)))
    for k in range(n):
      slot_g1.append(g1)
      slot_g2.append(g2)
      slot_types.append((sig[0], sig[1]))
      slot_condim.append(sig[4])
      slot_pairid.append(pid)
      slot_first.append(k == 0)

  # ----- flex contact slots: K budgeted slots per compatible (geom, flex)
  # pair (mj_collideGeomElem / mj_collidePlaneFlex candidates, top-K selected
  # by depth at runtime — the fixed-shape analog of filterFlexContacts,
  # engine_collision_driver.c:447)
  nflex = int(getattr(mjm, "nflex", 0))
  slot_flex2 = [-1] * len(slot_g1)
  slot_flex1 = [-1] * len(slot_g1)
  fp_geom, fp_flex, fp_adr = [], [], []
  flex_budget = int(os.environ.get("MJTPU_FLEX_BUDGET", "8"))
  flex_ok_types = {GeomType.PLANE, GeomType.SPHERE, GeomType.CAPSULE,
                   GeomType.BOX}
  for f in range(nflex):
    fvertbody = set(int(b) for b in np.asarray(
        mjm.flex_vertbodyid[mjm.flex_vertadr[f]:
                            mjm.flex_vertadr[f] + mjm.flex_vertnum[f]]))
    for g in range(mjm.ngeom):
      c1 = mjm.geom_contype[g] & mjm.flex_conaffinity[f]
      c2 = mjm.flex_contype[f] & mjm.geom_conaffinity[g]
      if not (c1 or c2):
        continue
      if int(mjm.flex_dim[f]) not in (1, 2, 3):
        raise NotImplementedError(f"flex {f}: unsupported dim")
      t = GeomType(mjm.geom_type[g])
      if t not in flex_ok_types:
        raise NotImplementedError(f"flex vs geom type {t.name}")
      # geoms fully attached to flex vertex bodies never collide with it
      if t != GeomType.PLANE and int(mjm.geom_bodyid[g]) in fvertbody and \
         int(mjm.flex_elemnum[f]) <= 1:
        continue
      p1, p2 = int(mjm.geom_priority[g]), int(mjm.flex_priority[f])
      if p1 != p2:
        condim = int(mjm.geom_condim[g] if p1 > p2 else mjm.flex_condim[f])
      else:
        condim = int(max(mjm.geom_condim[g], mjm.flex_condim[f]))
      fp_geom.append(g)
      fp_flex.append(f)
      fp_adr.append(len(slot_g1))
      for k in range(flex_budget):
        slot_g1.append(g)
        slot_g2.append(-1)
        slot_types.append((int(t), -1))
        slot_condim.append(condim)
        slot_pairid.append(-1)
        slot_first.append(k == 0)
        slot_flex2.append(f)
        slot_flex1.append(-1)

  # ----- flex self-collision + internal (within-element) slots: per flex,
  # static candidate element pairs (no shared vertex bodies — the static
  # analog of mj_collideElems' body filter, engine_collision_driver.c:2545)
  # own `npair` budgeted slots filled per step by AABB-separation top-K then
  # elementwise narrowphase (fixed-shape mj_collideFlexSAP,
  # engine_collision_driver.c:2315); dim-3 internal anti-inversion contacts
  # own min(4*nelem, budget) slots (mj_collideFlexInternal,
  # engine_collision_driver.c:2230)
  self_meta, int_meta, ev_meta = [], [], []
  if nflex:
    selfcollide = np.asarray(getattr(mjm, "flex_selfcollide",
                                     np.zeros(nflex)), dtype=np.int64)
    internal = np.asarray(getattr(mjm, "flex_internal", np.zeros(nflex)),
                          dtype=bool)
    evpairnum = np.asarray(getattr(mjm, "flex_evpairnum", np.zeros(nflex)),
                           dtype=np.int64)
    evpairadr = np.asarray(getattr(mjm, "flex_evpairadr", np.zeros(nflex)),
                           dtype=np.int64)
    layer = np.asarray(getattr(mjm, "flex_elemlayer",
                               np.zeros(int(mjm.nflexelem))), dtype=np.int64)
    activel = np.asarray(getattr(mjm, "flex_activelayers", np.ones(nflex)),
                         dtype=np.int64)
    self_budget = int(os.environ.get("MJTPU_SELF_BUDGET", "16"))
    int_budget = int(os.environ.get("MJTPU_INT_BUDGET", "64"))
    vb_all = np.asarray(mjm.flex_vertbodyid, dtype=np.int64)
    for f in range(nflex):
      dm = int(mjm.flex_dim[f])
      ca, cn = int(mjm.flex_elemadr[f]), int(mjm.flex_elemnum[f])
      if cn == 0:
        continue
      edata = np.asarray(mjm.flex_elem[
          int(mjm.flex_elemdataadr[f]):
          int(mjm.flex_elemdataadr[f]) + cn * (dm + 1)]).reshape(cn, dm + 1)
      vb = vb_all[int(mjm.flex_vertadr[f]) + edata]       # (cn, dm+1)
      condim_f = int(mjm.flex_condim[f])
      if int(selfcollide[f]) != 0 and cn >= 2:
        coll = (layer[ca:ca + cn] < activel[f]) if dm == 3 \
            else np.ones(cn, dtype=bool)
        els = np.where(coll)[0]
        ii, jj = np.triu_indices(len(els), k=1)
        e1c, e2c = els[ii], els[jj]
        shared = ((vb[e1c][:, :, None] == vb[e2c][:, None, :])
                  & (vb[e1c][:, :, None] >= 0)).any(axis=(1, 2))
        e1c, e2c = e1c[~shared], e2c[~shared]
        if len(e1c):
          npair = min(self_budget, len(e1c))
          self_meta.append(dict(flex=f, adr=len(slot_g1), npair=npair,
                                e1=(ca + e1c).astype(np.int32),
                                e2=(ca + e2c).astype(np.int32), dim=dm))
          for k in range(npair):
            slot_g1.append(0)
            slot_g2.append(-1)
            slot_types.append((-1, -1))
            slot_condim.append(condim_f)
            slot_pairid.append(-1)
            slot_first.append(False)
            slot_flex2.append(f)
            slot_flex1.append(f)
      if internal[f] and dm == 3:
        nslots = min(4 * cn, int_budget)
        int_meta.append(dict(flex=f, adr=len(slot_g1), nslots=nslots))
        for k in range(nslots):
          slot_g1.append(0)
          slot_g2.append(-1)
          slot_types.append((-1, -1))
          slot_condim.append(1)          # condim forced to 1 (driver.c:2257)
          slot_pairid.append(-1)
          slot_first.append(False)
          slot_flex2.append(f)
          slot_flex1.append(f)
      if internal[f] and evpairnum[f] > 0:
        # predefined element-vertex pairs (mj_collideFlexInternal,
        # engine_collision_driver.c:2233): vertex sphere vs element
        ev = np.asarray(mjm.flex_evpair[
            2 * evpairadr[f]:2 * (evpairadr[f] + evpairnum[f])],
            dtype=np.int32).reshape(-1, 2)             # (N, 2) local (e, v)
        nslots = min(len(ev), int_budget)
        ev_meta.append(dict(flex=f, adr=len(slot_g1), nslots=nslots, ev=ev))
        for k in range(nslots):
          slot_g1.append(0)
          slot_g2.append(-1)
          slot_types.append((-1, -1))
          slot_condim.append(condim_f)
          slot_pairid.append(-1)
          slot_first.append(False)
          slot_flex2.append(f)
          slot_flex1.append(f)

  # ----- dynamic pair-group slots (appended last): npair budgeted pair
  # slots × k contacts each; slot geom ids are representative (first
  # candidate) — the real pair is selected per step and carried in
  # Contact.geomids
  dynslot = [False] * len(slot_g1)
  dyn_meta = []
  for sig, plist in dyn_groups:
    t1, t2, did1, did2, condim = sig
    n = _PAIR_NCON.get((GeomType(t1), GeomType(t2)), CONVEX_NCON)
    g1s = np.array([p[0] for p in plist], dtype=np.int32)
    g2s = np.array([p[1] for p in plist], dtype=np.int32)
    npair = min(pair_budget, len(plist))
    dyn_meta.append(dict(g1=g1s, g2=g2s, adr=len(slot_g1), npair=npair, k=n,
                         t1=t1, t2=t2, did1=did1, did2=did2))
    for _ in range(npair):
      for k in range(n):
        slot_g1.append(int(g1s[0]))
        slot_g2.append(int(g2s[0]))
        slot_types.append((t1, t2))
        slot_condim.append(condim)
        slot_pairid.append(-1)
        slot_first.append(False)     # filled by the dynamic path, not the
        slot_flex2.append(-1)        # static type loop
        slot_flex1.append(-1)
        dynslot.append(True)

  return ContactMeta(
      ncon=len(slot_g1),
      geom1=np.array(slot_g1, dtype=np.int32).reshape(-1),
      geom2=np.array(slot_g2, dtype=np.int32).reshape(-1),
      pair_type=np.array(slot_types, dtype=np.int32).reshape(-1, 2),
      condim=np.array(slot_condim, dtype=np.int32).reshape(-1),
      pairid=np.array(slot_pairid, dtype=np.int32).reshape(-1),
      con_first=np.array(slot_first, dtype=bool).reshape(-1),
      flex2=np.array(slot_flex2, dtype=np.int32).reshape(-1),
      flexpair_geom=np.array(fp_geom, dtype=np.int32).reshape(-1),
      flexpair_flex=np.array(fp_flex, dtype=np.int32).reshape(-1),
      flexpair_adr=np.array(fp_adr, dtype=np.int32).reshape(-1),
      flex_budget=flex_budget,
      dyngroups=tuple(dyn_meta),
      dynslot=np.array(dynslot, dtype=bool).reshape(-1),
      flex1=np.array(slot_flex1, dtype=np.int32).reshape(-1),
      selfgroups=tuple(self_meta),
      intgroups=tuple(int_meta),
      evgroups=tuple(ev_meta),
      sdfgroups=tuple(sdf_meta),
  )


def _flex_meta(mjm: Any):
  """Static flex topology (FlexMeta) from the compiled model; guards the
  features not implemented yet (interpolated/nodal flexes, element-level
  stretch/bending stiffness, self/internal collision)."""
  from mujoco_tpu.models.types import FlexMeta
  nflex = int(getattr(mjm, "nflex", 0))
  zi = lambda n: np.zeros((n,), dtype=np.int32)
  if nflex == 0:
    return FlexMeta(
        nflex=0, nvert=0, nedge=0, nelem=0, dim=zi(0), vertadr=zi(0),
        vertnum=zi(0), edgeadr=zi(0), edgenum=zi(0), elemadr=zi(0),
        elemnum=zi(0), vertbodyid=zi(0), centered=zi(0).astype(bool),
        vert_iszero=zi(0).astype(bool), edge=zi(0).reshape(0, 2),
        edge_flexid=zi(0), edge_rigid=zi(0).astype(bool),
        elem=zi(0).reshape(0, 4), elem_flexid=zi(0),
        rigid=zi(0).astype(bool), edgeequality=zi(0), condim=zi(0),
        priority=zi(0), contype=zi(0), conaffinity=zi(0),
        elemedge=zi(0).reshape(0, 6), edgeflap=zi(0).reshape(0, 2),
        has_stretch=zi(0).astype(bool), has_bending=zi(0).astype(bool),
        vert_simple=zi(0).astype(bool), vert_free=zi(0).astype(bool),
        vert_dofadr=zi(0), elem_collidable=zi(0).astype(bool),
        elem_layer=zi(0), interp=zi(0), nnode=0, nodeadr=zi(0),
        nodenum=zi(0), nodebodyid=zi(0), node_iszero=zi(0).astype(bool),
        cellnum=zi(0).reshape(0, 3), vert0=np.zeros((0, 3)),
        vert_node=zi(0).reshape(0, 8),
        vert_nodew=np.zeros((0, 8)),
        interp_stiffadr=np.full(0, -1, dtype=np.int64),
        interp_cell_active=(), strain=())

  interp = np.asarray(getattr(mjm, "flex_interp", np.zeros(nflex)), dtype=int)
  if ((interp < 0) | (interp > 2)).any():
    raise NotImplementedError(
        "shell interpolated flexes (flex_interp < 0: TFI interior "
        "reconstruction)")
  # edgeequality: 0 none, 1 edge, 2 vert, 3 strain (flexeq_map,
  # xml_native_reader.cc:1722); strain rows are handled via eq_type 6
  if (np.asarray(mjm.flex_edgeequality) == 2).any():
    raise NotImplementedError("flex vertex-based equality (mjEQ_FLEXVERT)")

  nvert = int(mjm.nflexvert)
  nedge = int(mjm.nflexedge)
  nelem = int(mjm.nflexelem)
  dim = np.asarray(mjm.flex_dim, dtype=np.int32)
  vertadr = np.asarray(mjm.flex_vertadr, dtype=np.int32)
  edgeadr = np.asarray(mjm.flex_edgeadr, dtype=np.int32)
  elemadr = np.asarray(mjm.flex_elemadr, dtype=np.int32)
  elemnum = np.asarray(mjm.flex_elemnum, dtype=np.int32)

  edge_flexid = np.zeros(nedge, dtype=np.int32)
  elem_flexid = np.zeros(nelem, dtype=np.int32)
  edge_global = np.zeros((nedge, 2), dtype=np.int32)
  elem_global = np.full((nelem, 4), -1, dtype=np.int32)
  for f in range(nflex):
    ea, en = edgeadr[f], int(mjm.flex_edgenum[f])
    edge_flexid[ea:ea + en] = f
    edge_global[ea:ea + en] = (np.asarray(mjm.flex_edge[ea:ea + en])
                               + vertadr[f])
    ca, cn, dm = elemadr[f], elemnum[f], int(dim[f])
    elem_flexid[ca:ca + cn] = f
    edata = np.asarray(mjm.flex_elem[
        int(mjm.flex_elemdataadr[f]):int(mjm.flex_elemdataadr[f])
        + cn * (dm + 1)]).reshape(cn, dm + 1)
    elem_global[ca:ca + cn, :dm + 1] = edata + vertadr[f]

  vert = np.asarray(mjm.flex_vert, dtype=np.float64).reshape(nvert, 3)

  # ----- element elasticity topology (engine_passive.c:459-651)
  elemedge = np.zeros((nelem, 6), dtype=np.int32)
  elemedgeadr = np.asarray(getattr(mjm, "flex_elemedgeadr",
                                   np.full(nflex, -1)), dtype=np.int64)
  stiffadr = np.asarray(getattr(mjm, "flex_stiffnessadr",
                                np.full(nflex, -1)), dtype=np.int64)
  bendadr = np.asarray(getattr(mjm, "flex_bendingadr",
                               np.full(nflex, -1)), dtype=np.int64)
  stiff = np.asarray(getattr(mjm, "flex_stiffness", np.zeros(0)),
                     dtype=np.float64)
  has_stretch = np.zeros(nflex, dtype=bool)
  has_bending = np.zeros(nflex, dtype=bool)
  interp_all = np.asarray(getattr(mjm, "flex_interp", np.zeros(nflex)),
                          dtype=int)
  for f in range(nflex):
    dm = int(dim[f])
    has_stretch[f] = (dm >= 2 and stiffadr[f] >= 0 and interp_all[f] == 0
                      and stiff[stiffadr[f]] != 0
                      and not bool(mjm.flex_rigid[f]))
    has_bending[f] = (dm == 2 and bendadr[f] >= 0
                      and not bool(mjm.flex_rigid[f]))
    if elemedgeadr[f] >= 0 and getattr(mjm, "nflexelemedge", 0):
      ne_loc = 3 if dm == 2 else (6 if dm == 3 else 0)
      if ne_loc:
        ca, cn = elemadr[f], int(elemnum[f])
        ee = np.asarray(mjm.flex_elemedge[
            elemedgeadr[f]:elemedgeadr[f] + cn * ne_loc]).reshape(cn, ne_loc)
        elemedge[ca:ca + cn, :ne_loc] = ee + edgeadr[f]

  edgeflap = np.full((nedge, 2), -1, dtype=np.int32)
  ef = np.asarray(getattr(mjm, "flex_edgeflap", np.full((nedge, 2), -1)),
                  dtype=np.int32).reshape(nedge, 2)
  for f in range(nflex):
    ea, en = edgeadr[f], int(mjm.flex_edgenum[f])
    loc = ef[ea:ea + en]
    edgeflap[ea:ea + en] = np.where(loc >= 0, loc + vertadr[f], -1)

  vertbody = np.asarray(mjm.flex_vertbodyid, dtype=np.int32)
  body_simple = np.asarray(getattr(mjm, "body_simple",
                                   np.zeros(mjm.nbody)), dtype=np.int32)
  body_dofnum = np.asarray(mjm.body_dofnum, dtype=np.int32)
  body_dofadr = np.asarray(mjm.body_dofadr, dtype=np.int32)
  vert_simple = body_simple[vertbody] == 2
  vert_free = body_dofnum[vertbody] == 3
  vert_dofadr = np.where(body_dofnum[vertbody] > 0,
                         body_dofadr[vertbody], -1).astype(np.int32)

  # dim-3 elements collide only in the surface layers
  # (engine_collision_driver.c:351)
  elem_collidable = np.ones(nelem, dtype=bool)
  layer = np.asarray(getattr(mjm, "flex_elemlayer", np.zeros(nelem)),
                     dtype=np.int64)
  active = np.asarray(getattr(mjm, "flex_activelayers", np.ones(nflex)),
                      dtype=np.int64)
  for f in range(nflex):
    if int(dim[f]) == 3:
      ca, cn = elemadr[f], int(elemnum[f])
      elem_collidable[ca:ca + cn] = layer[ca:ca + cn] < active[f]

  return FlexMeta(
      elem_collidable=elem_collidable,
      elem_layer=layer.astype(np.int32),
      elemedge=elemedge, edgeflap=edgeflap,
      has_stretch=has_stretch, has_bending=has_bending,
      vert_simple=vert_simple, vert_free=vert_free,
      vert_dofadr=vert_dofadr,
      nflex=nflex, nvert=nvert, nedge=nedge, nelem=nelem,
      dim=dim, vertadr=vertadr,
      vertnum=np.asarray(mjm.flex_vertnum, dtype=np.int32),
      edgeadr=edgeadr, edgenum=np.asarray(mjm.flex_edgenum, dtype=np.int32),
      elemadr=elemadr, elemnum=elemnum,
      vertbodyid=np.asarray(mjm.flex_vertbodyid, dtype=np.int32),
      centered=np.asarray(mjm.flex_centered, dtype=bool),
      vert_iszero=(vert == 0).all(axis=1),
      edge=edge_global, edge_flexid=edge_flexid,
      edge_rigid=(np.asarray(getattr(mjm, "flexedge_rigid",
                                     np.zeros(nedge)), dtype=bool)
                  # interp flexes generate no edge forces/Jacobians
                  # (engine_core_smooth.c:696: flex_rigid || flex_interp)
                  | (interp[edge_flexid] != 0)),
      elem=elem_global, elem_flexid=elem_flexid,
      rigid=np.asarray(mjm.flex_rigid, dtype=bool),
      edgeequality=np.asarray(mjm.flex_edgeequality, dtype=np.int32),
      condim=np.asarray(mjm.flex_condim, dtype=np.int32),
      priority=np.asarray(mjm.flex_priority, dtype=np.int32),
      contype=np.asarray(mjm.flex_contype, dtype=np.int32),
      conaffinity=np.asarray(mjm.flex_conaffinity, dtype=np.int32),
      **_interp_meta(mjm, nflex, nvert, interp, vertadr))


def _strain_entries(mjm: Any) -> tuple:
  """Static per-equality tables for mjEQ_FLEXSTRAIN rows
  (engine_core_constraint.c:806-980, volume mode): one equality = one
  interpolated 3D cell; flex_stiffness holds the eigen format
  [neig | sqrt(λ)·v_1 | ...] per ndof² block (EigendecomposeStiffness,
  user_mesh.cc:4127). Returns a tuple of dicts with eq, flex, order, npe,
  gind, neig, eigvecs, diaga."""
  eqt = np.asarray(getattr(mjm, "eq_type", np.zeros(0)), dtype=np.int64)
  if not (eqt == 6).any():
    return ()
  interp = np.asarray(mjm.flex_interp, dtype=int)
  cellnum = np.asarray(mjm.flex_cellnum).reshape(-1, 3).astype(int)
  stiffadr = np.asarray(mjm.flex_stiffnessadr, dtype=np.int64)
  stiff = np.asarray(mjm.flex_stiffness, dtype=np.float64)
  nodeadr = np.asarray(mjm.flex_nodeadr, dtype=np.int64)
  nodebody = np.asarray(mjm.flex_nodebodyid, dtype=np.int64)
  invw = np.asarray(mjm.body_invweight0, dtype=np.float64).reshape(-1, 2)
  eq_data = np.asarray(mjm.eq_data, dtype=np.float64).reshape(len(eqt), -1)
  eq_obj1 = np.asarray(mjm.eq_obj1id, dtype=np.int64)
  out = []
  for i in np.nonzero(eqt == 6)[0]:
    f = int(eq_obj1[i])
    order = int(interp[f])
    if order < 1:
      raise NotImplementedError(
          "mjEQ_FLEXSTRAIN shell mode (flex_interp < 0 / non-interpolated)")
    npe = (order + 1) ** 3
    ndof = 3 * npe
    cx, cy, cz = (int(x) for x in cellnum[f])
    ci, cj, ck = (int(x) for x in eq_data[i, :3])
    elem_idx = ci * cy * cz + cj * cz + ck
    block = stiff[stiffadr[f] + elem_idx * ndof * ndof:
                  stiffadr[f] + (elem_idx + 1) * ndof * ndof]
    neig = int(block[0])
    eigvecs = block[1:1 + neig * ndof].reshape(neig, ndof).copy()
    # cell node indices (mju_flexGatherCellState ordering: x-slowest)
    ny_g, nz_g = cy * order + 1, cz * order + 1
    gind = np.array(
        [((ci * order + li) * ny_g + (cj * order + lj)) * nz_g
         + (ck * order + lk)
         for li in range(order + 1)
         for lj in range(order + 1)
         for lk in range(order + 1)], dtype=np.int64)
    # diagA = avg node-body invweight0 (mj_diagApprox,
    # engine_core_constraint.c:1809)
    diaga = float(invw[nodebody[nodeadr[f] + gind], 0].mean())
    out.append(dict(eq=int(i), flex=f, order=order, npe=npe, gind=gind,
                    neig=neig, eigvecs=eigvecs, diaga=diaga))
  return tuple(out)


def _interp_meta(mjm: Any, nflex, nvert, interp, vertadr) -> dict:
  """Node tables + static per-vertex trilinear weights for interpolated
  flexes (mj_flex interp branch, engine_core_smooth.c:580-625;
  mju_cellLookup + mju_evalBasisArray, engine_util_misc.c:627,578).
  flex_vert0 holds rest grid coordinates in [0, 1]^3; per-vertex node ids
  and weights are constants of the rest pose, so the runtime interpolation
  is one fused (nvert, 8) gather + weighted sum."""
  nnode = int(getattr(mjm, "nflexnode", 0))
  nodeadr = np.asarray(getattr(mjm, "flex_nodeadr", np.full(nflex, -1)),
                       dtype=np.int32)
  nodenum = np.asarray(getattr(mjm, "flex_nodenum", np.zeros(nflex)),
                       dtype=np.int32)
  nodebodyid = np.asarray(getattr(mjm, "flex_nodebodyid",
                                  np.zeros(nnode)), dtype=np.int32)
  node = np.asarray(getattr(mjm, "flex_node",
                            np.zeros((nnode, 3)))).reshape(nnode, 3)
  cellnum = np.asarray(getattr(mjm, "flex_cellnum",
                               np.ones((nflex, 3)))).reshape(nflex, 3)
  cellnum = cellnum.astype(np.int32)
  vert0 = np.asarray(getattr(mjm, "flex_vert0",
                             np.zeros((nvert, 3)))).reshape(nvert, 3)
  kmax = 27 if (interp == 2).any() else 8
  vert_node = np.zeros((nvert, kmax), dtype=np.int32)
  vert_nodew = np.zeros((nvert, kmax))
  for f in range(nflex):
    order = int(interp[f])
    if order == 0:
      continue
    va, vn = int(vertadr[f]), int(np.asarray(mjm.flex_vertnum)[f])
    cn = cellnum[f].astype(np.float64)
    ny_g, nz_g = int(cn[1]) * order + 1, int(cn[2]) * order + 1
    coord = vert0[va:va + vn]                          # (vn, 3)
    ci = np.clip(np.floor(coord * cn).astype(int), 0,
                 np.maximum(cn.astype(int) - 1, 0))    # (vn, 3)
    local = np.clip(coord * cn - ci, 0.0, 1.0)
    # 1D Lagrange shape functions (mju_flexPhi, engine_util_misc.h:130)
    if order == 1:
      p = np.stack([1.0 - local, local], axis=-1)      # (vn, 3, 2)
    else:
      s = local
      p = np.stack([2 * s * s - 3 * s + 1, 4 * (s - s * s),
                    2 * s * s - s], axis=-1)            # (vn, 3, 3)
    k = 0
    for i0 in range(order + 1):
      for i1 in range(order + 1):
        for i2 in range(order + 1):
          idx = (((ci[:, 0] * order + i0) * ny_g
                  + (ci[:, 1] * order + i1)) * nz_g
                 + (ci[:, 2] * order + i2))
          vert_node[va:va + vn, k] = nodeadr[f] + idx
          vert_nodew[va:va + vn, k] = (p[:, 0, i0] * p[:, 1, i1]
                                       * p[:, 2, i2])
          k += 1
  # raw FEM stiffness metadata (mj_flexPassiveInterp, engine_passive.c:61):
  # stored matrices are -K_physical, one ndof_elem^2 block per cell; cells
  # with k_elem[0] == 0 are empty and skipped
  stiffadr = np.asarray(getattr(mjm, "flex_stiffnessadr",
                                np.full(nflex, -1)), dtype=np.int64)
  stiff = np.asarray(getattr(mjm, "flex_stiffness", np.zeros(0)),
                     dtype=np.float64)
  interp_stiffadr = np.where(interp >= 1, stiffadr, -1)
  # strain-constrained flexes (edgeequality == 3): flex_stiffness holds the
  # EIGEN format consumed by the mjEQ_FLEXSTRAIN rows, not a raw FEM matrix
  # — the passive path is off (has_stretch gate, engine_passive.c:92)
  strain = _strain_entries(mjm)
  edgeeq = np.asarray(getattr(mjm, "flex_edgeequality", np.zeros(nflex)),
                      dtype=int)
  interp_stiffadr = np.where(edgeeq == 3, -1, interp_stiffadr)
  cell_active = []
  for f in range(nflex):
    if interp[f] < 1 or interp_stiffadr[f] < 0 or not stiff.size:
      cell_active.append(np.zeros(0, dtype=bool))
      continue
    order = int(interp[f])
    npe = (order + 1) ** 3
    ndof = 3 * npe
    ncell = int(np.prod(cellnum[f]))
    blocks = stiff[interp_stiffadr[f]:
                   interp_stiffadr[f] + ncell * ndof * ndof]
    cell_active.append(blocks.reshape(ncell, ndof * ndof)[:, 0] != 0)
  return dict(interp=interp.astype(np.int32), nnode=nnode,
              nodeadr=nodeadr, nodenum=nodenum, nodebodyid=nodebodyid,
              node_iszero=(node == 0).all(axis=1) if nnode
              else np.zeros(0, dtype=bool),
              cellnum=cellnum, vert0=vert0,
              vert_node=vert_node, vert_nodew=vert_nodew,
              interp_stiffadr=interp_stiffadr,
              interp_cell_active=tuple(cell_active),
              strain=strain)


def _flex_stiffness_dense(mjm: Any, flx) -> np.ndarray:
  """Dense (nelem, 21) per-element stretch metric from the flat
  flex_stiffness/flex_stiffnessadr layout (21 triu coefficients per element,
  engine_passive.c:553-608); zero rows for flexes without stretch."""
  out = np.zeros((flx.nelem, 21), dtype=np.float64)
  stiff = np.asarray(getattr(mjm, "flex_stiffness", np.zeros(0)),
                     dtype=np.float64)
  adr = np.asarray(getattr(mjm, "flex_stiffnessadr",
                           np.full(flx.nflex, -1)), dtype=np.int64)
  for f in range(flx.nflex):
    if adr[f] < 0 or not stiff.size or int(np.asarray(flx.interp)[f]) >= 1:
      continue                     # interp flexes store raw FEM matrices
    ca, cn = int(flx.elemadr[f]), int(flx.elemnum[f])
    out[ca:ca + cn] = stiff[adr[f]:adr[f] + cn * 21].reshape(cn, 21)
  return out


def _flex_bending_dense(mjm: Any, flx) -> np.ndarray:
  """Dense (nedge, 17) per-edge thin-plate bending operator (4x4 Hessian +
  curved-reference coefficient, engine_passive.c:228-230,465-473); zero rows
  for flexes without bending."""
  out = np.zeros((flx.nedge, 17), dtype=np.float64)
  bend = np.asarray(getattr(mjm, "flex_bending", np.zeros(0)),
                    dtype=np.float64)
  adr = np.asarray(getattr(mjm, "flex_bendingadr",
                           np.full(flx.nflex, -1)), dtype=np.int64)
  for f in range(flx.nflex):
    if adr[f] < 0 or not bend.size:
      continue
    ea, en = int(flx.edgeadr[f]), int(flx.edgenum[f])
    out[ea:ea + en] = bend[adr[f]:adr[f] + en * 17].reshape(en, 17)
  return out


def _efc_meta(mjm: Any, con: ContactMeta, cone: int) -> EfcMeta:
  """Fixed constraint-row layout, mirroring the row taxonomy of
  mj_makeConstraint (/root/reference/src/engine/engine_core_constraint.c):
  equality → dof friction → limits → contacts, with compile-time counts."""
  eq_id, eq_row = [], []
  flexedge_rigid = np.asarray(getattr(mjm, "flexedge_rigid",
                                      np.zeros(getattr(mjm, "nflexedge", 0))),
                              dtype=bool)
  strain_neig = {s["eq"]: s["neig"] for s in _strain_entries(mjm)}
  for i in range(mjm.neq):
    t = EqType(mjm.eq_type[i])
    if t == EqType.FLEX:
      # one row per non-rigid edge of the flex (mjEQ_FLEX,
      # engine_core_constraint.c:982); eq_row carries the GLOBAL edge id
      f = int(mjm.eq_obj1id[i])
      ea, en = int(mjm.flex_edgeadr[f]), int(mjm.flex_edgenum[f])
      for e in range(ea, ea + en):
        if flexedge_rigid[e]:
          continue
        eq_id.append(i)
        eq_row.append(e)
      continue
    if t == EqType.FLEXSTRAIN:
      # one row per retained eigenmode of the element's stiffness
      # (engine_core_constraint.c:2451-2510); eq_row = eigenmode index
      for r in range(strain_neig.get(i, 0)):
        eq_id.append(i)
        eq_row.append(r)
      continue
    nrow = {EqType.CONNECT: 3, EqType.WELD: 6, EqType.JOINT: 1,
            EqType.TENDON: 1}.get(t)
    if nrow is None:
      raise NotImplementedError(f"equality type {t}")
    for r in range(nrow):
      eq_id.append(i)
      eq_row.append(r)
  ne = len(eq_id)

  friction_dof = [i for i in range(mjm.nv) if mjm.dof_frictionloss[i] > 0]
  friction_ten = [i for i in range(mjm.ntendon)
                  if mjm.tendon_frictionloss[i] > 0]
  nf = len(friction_dof) + len(friction_ten)

  # limit rows: hinge/slide and tendon limits get one row per side (both can
  # be simultaneously within margin, mj_instantiateLimit); ball gets one.
  limit_jnt, limit_ten, limit_side = [], [], []
  for i in range(mjm.njnt):
    if not mjm.jnt_limited[i]:
      continue
    if mjm.jnt_type[i] == JointType.BALL:
      limit_jnt.append(i)
      limit_ten.append(-1)
      limit_side.append(0)
    else:
      for side in (-1, 1):
        limit_jnt.append(i)
        limit_ten.append(-1)
        limit_side.append(side)
  for i in range(mjm.ntendon):
    if not mjm.tendon_limited[i]:
      continue
    for side in (-1, 1):
      limit_jnt.append(-1)
      limit_ten.append(i)
      limit_side.append(side)
  nl = len(limit_jnt)

  con_id, con_row, con_efcadr, con_nrow = [], [], [], []
  adr = ne + nf + nl
  for c in range(con.ncon):
    dim = int(con.condim[c])
    if dim == 1:
      nrow = 1
    elif cone == ConeType.PYRAMIDAL:
      nrow = 2 * (dim - 1)
    else:
      nrow = dim
    con_efcadr.append(adr)
    con_nrow.append(nrow)
    for r in range(nrow):
      con_id.append(c)
      con_row.append(r)
    adr += nrow

  ncon_rows = len(con_id)
  pad = lambda x: np.array(x, dtype=np.int32).reshape(-1)
  return EfcMeta(
      nefc=ne + nf + nl + ncon_rows,
      ne=ne, nf=nf, nl=nl, ncon_rows=ncon_rows,
      eq_id=pad(eq_id), eq_row=pad(eq_row),
      friction_dof=pad(friction_dof + [-1] * len(friction_ten)),
      friction_ten=pad([-1] * len(friction_dof) + friction_ten),
      limit_jnt=pad(limit_jnt), limit_ten=pad(limit_ten),
      limit_side=pad(limit_side),
      con_id=pad(con_id), con_row=pad(con_row),
      con_efcadr=pad(con_efcadr), con_nrow=pad(con_nrow),
  )


def _names(mjm: Any) -> dict:
  """Static name→id tables per object type (mj_name2id analog).

  Keys are lowercase type names ('body', 'joint', 'geom', 'site', 'actuator',
  'sensor', 'tendon', 'camera', 'equality', 'key'); values map name→id.
  """
  if getattr(mjm, "is_mjtpu_compiled", False):
    return {k: dict(v) for k, v in mjm.name_tables.items()}
  import mujoco as _mj
  types = {
      "body": (_mj.mjtObj.mjOBJ_BODY, mjm.nbody),
      "joint": (_mj.mjtObj.mjOBJ_JOINT, mjm.njnt),
      "geom": (_mj.mjtObj.mjOBJ_GEOM, mjm.ngeom),
      "site": (_mj.mjtObj.mjOBJ_SITE, mjm.nsite),
      "actuator": (_mj.mjtObj.mjOBJ_ACTUATOR, mjm.nu),
      "sensor": (_mj.mjtObj.mjOBJ_SENSOR, mjm.nsensor),
      "tendon": (_mj.mjtObj.mjOBJ_TENDON, mjm.ntendon),
      "camera": (_mj.mjtObj.mjOBJ_CAMERA, mjm.ncam),
      "equality": (_mj.mjtObj.mjOBJ_EQUALITY, mjm.neq),
      "key": (_mj.mjtObj.mjOBJ_KEY, mjm.nkey),
  }
  out = {}
  for tname, (objtype, n) in types.items():
    table = {}
    for i in range(n):
      name = _mj.mj_id2name(mjm, objtype, i)
      if name:
        table[name] = i
    out[tname] = table
  return out


def _actuator_meta(mjm: Any):
  """Remap actuator type enums to the reference v3.11 values by NAME (the pip
  package may use different numeric codes), guard unsupported types loudly,
  and precompute static DC-motor/PID slot layouts and servo wrap periods.

  Counterparts: mjtDyn/mjtGain/mjtBias (mjtype.h:243-273), mj_dcmotorSlots
  (engine_util_misc.c:1202), wrapPeriod (engine_forward.c:295).
  """
  from mujoco_tpu.models.types import TrnType

  nu = int(mjm.nu)
  if getattr(mjm, "is_mjtpu_compiled", False):
    # the native compiler already emits the engine's (v3.11) enum values
    dyntype = np.asarray(mjm.actuator_dyntype, dtype=np.int32)
    gaintype = np.asarray(mjm.actuator_gaintype, dtype=np.int32)
    biastype = np.asarray(mjm.actuator_biastype, dtype=np.int32)
  else:
    import mujoco as _mj
    dyn_map = {int(v): DynType[k[len("mjDYN_"):]].value
               for k, v in _mj.mjtDyn.__members__.items()}
    gain_map = {int(v): GainType[k[len("mjGAIN_"):]].value
                for k, v in _mj.mjtGain.__members__.items()}
    bias_map = {int(v): BiasType[k[len("mjBIAS_"):]].value
                for k, v in _mj.mjtBias.__members__.items()}
    dyntype = np.array([dyn_map[int(t)] for t in mjm.actuator_dyntype],
                       dtype=np.int32)
    gaintype = np.array([gain_map[int(t)] for t in mjm.actuator_gaintype],
                        dtype=np.int32)
    biastype = np.array([bias_map[int(t)] for t in mjm.actuator_biastype],
                        dtype=np.int32)

  from mujoco_tpu import plugin as _plugin_mod
  cb_dyn, cb_gain, cb_bias, _, _ = _plugin_mod.resolve()
  for i in range(nu):
    # USER dyn/gain/bias route to registered pure-JAX callbacks
    # (mjcb_act_* analog, mujoco_tpu/plugin.py); unregistered ones raise
    if (dyntype[i] == DynType.USER and cb_dyn is None) or \
       (gaintype[i] == GainType.USER and cb_gain is None) or \
       (biastype[i] == BiasType.USER and cb_bias is None):
      raise NotImplementedError(
          f"actuator {i}: USER dyn/gain/bias requires "
          "plugin.set_actuator_callbacks before put_model")
    if (gaintype[i] == GainType.SO3) != (biastype[i] == BiasType.SO3):
      raise ValueError(
          f"actuator {i}: gaintype and biastype must both be 'so3'")

  dynprm = np.asarray(mjm.actuator_dynprm, dtype=np.float64)
  gainprm = np.asarray(mjm.actuator_gainprm, dtype=np.float64)
  biasprm = np.asarray(mjm.actuator_biasprm, dtype=np.float64)
  slots = np.full((nu, 7), -1, dtype=np.int32)
  for i in range(nu):
    n = 0
    if dyntype[i] == DynType.DCMOTOR:
      # mj_dcmotorSlots order: slew, integral, temperature, bristle, current
      if dynprm[i, 7] > 0:
        slots[i, 0] = n; n += 1
      if gainprm[i, 5] > 0:
        slots[i, 1] = n; n += 1
      if dynprm[i, 2] > 0:
        slots[i, 2] = n; n += 1
      if dynprm[i, 5] > 0:
        slots[i, 3] = n; n += 1
      if dynprm[i, 0] > 0:
        slots[i, 4] = n; n += 1
      slots[i, 6] = int(gainprm[i, 8])
      if n != int(mjm.actuator_actnum[i]):
        raise ValueError(
            f"actuator {i}: DC motor state size {mjm.actuator_actnum[i]} "
            f"does not match its parameter slots ({n})")
    elif dyntype[i] == DynType.PID:
      # PID slot order: slew, integral (engine_forward.c:451)
      if dynprm[i, 1] > 0:
        slots[i, 0] = n; n += 1
      if gainprm[i, 0] > 0:
        slots[i, 1] = n; n += 1
    slots[i, 5] = n

  # wrap period, frozen from put_model-time numpy values
  wrapprd = np.zeros((nu,), dtype=np.float64)
  trntype = np.asarray(mjm.actuator_trntype)
  gear = np.asarray(mjm.actuator_gear, dtype=np.float64)
  for i in range(nu):
    servo = (gaintype[i] == GainType.FIXED
             and biastype[i] == BiasType.AFFINE
             and gainprm[i, 0] == -biasprm[i, 1]
             and dyntype[i] in (DynType.NONE, DynType.INTEGRATOR))
    pid = gaintype[i] == GainType.PID
    if not servo and not pid:
      continue
    trn = int(trntype[i])
    if trn == int(TrnType.SITE) and int(mjm.actuator_trnid[i, 1]) >= 0 and \
       not gear[i, :3].any():
      wrapprd[i] = 2 * np.pi * np.linalg.norm(gear[i, 3:6])
    elif trn in (int(TrnType.JOINT), int(TrnType.JOINTINPARENT)) and \
         int(mjm.jnt_type[mjm.actuator_trnid[i, 0]]) == 1:  # mjJNT_BALL
      wrapprd[i] = 2 * np.pi * np.linalg.norm(gear[i, :3])

  group = np.array(getattr(mjm, "actuator_group", np.zeros(nu)),
                   dtype=np.int32)

  # ----- SO3 ctrl/output block layout (mjmodel.h:787-791): ctrlnum = 4 for
  # the quat chart, 3 for expmap/integrator; outnum = 3 (mjTRN_SO3 rows).
  # Non-SO3 actuators have 1-wide blocks, so for SO3-free models the tables
  # are identity and nctrl == nout == nu.
  from mujoco_tpu.models.types import CtrlChart
  ctrlspec = np.array(getattr(mjm, "actuator_ctrlspec", np.zeros(nu)),
                      dtype=np.int32)
  ctrlnum = np.ones((nu,), dtype=np.int32)
  outnum = np.ones((nu,), dtype=np.int32)
  for i in range(nu):
    if gaintype[i] != GainType.SO3:
      continue
    # validation mirrors user_objects.cc:7118-7182
    if dyntype[i] not in (DynType.NONE, DynType.INTEGRATOR):
      raise ValueError(f"actuator {i}: so3 requires dyntype none/integrator")
    if gainprm[i, 0] != -biasprm[i, 1]:
      raise ValueError(f"actuator {i}: so3 requires gainprm[0] == -biasprm[1]")
    trn = int(trntype[i])
    if trn == int(TrnType.SO3):
      pass  # already resolved (native compiler emits TRN_SO3 directly)
    elif trn == int(TrnType.SITE):
      if int(mjm.actuator_trnid[i, 1]) < 0:
        raise ValueError(f"actuator {i}: so3 site transmission needs refsite")
    elif trn in (int(TrnType.JOINT), int(TrnType.JOINTINPARENT)):
      if int(mjm.jnt_type[mjm.actuator_trnid[i, 0]]) != 1:  # mjJNT_BALL
        raise ValueError(f"actuator {i}: so3 joint transmission needs a "
                         "ball joint")
    else:
      raise ValueError(f"actuator {i}: so3 requires site or ball joint "
                       "transmission")
    # resolve the transmission to mjTRN_SO3 (user_model.cc:4057)
    trntype = trntype.copy()
    trntype[i] = int(TrnType.SO3)
    if ctrlspec[i] == 0:
      ctrlspec[i] = int(CtrlChart.EXPMAP)
    if dyntype[i] == DynType.INTEGRATOR:
      if int(mjm.actuator_actnum[i]) != 3:
        raise ValueError(f"actuator {i}: so3 integrator requires actdim 3")
      if ctrlspec[i] == int(CtrlChart.QUAT):
        raise ValueError(f"actuator {i}: so3 quat input requires dyntype "
                         "none")
    ctrlnum[i] = 4 if ctrlspec[i] == int(CtrlChart.QUAT) else 3
    outnum[i] = 3
  ctrladr = (np.concatenate([[0], np.cumsum(ctrlnum)[:-1]])
             if nu else np.zeros((0,))).astype(np.int32)
  outadr = (np.concatenate([[0], np.cumsum(outnum)[:-1]])
            if nu else np.zeros((0,))).astype(np.int32)
  blocks = (ctrladr, ctrlnum, outadr, outnum, ctrlspec,
            trntype.astype(np.int32))
  return dyntype, gaintype, biastype, slots, wrapprd, group, blocks


def put_model(mjm: Any, dtype=None) -> Model:
  """Convert a compiled ``mujoco.MjModel`` into a TPU Model pytree."""
  dtype = dtype or jnp.zeros(0).dtype
  jx = lambda x: jnp.asarray(np.asarray(x), dtype=dtype)
  si = lambda x: np.array(x, dtype=np.int32)

  unsupported = set(np.asarray(mjm.geom_type)) - {
      int(t) for t in GeomType}
  if unsupported:
    raise NotImplementedError(f"geom types {unsupported}")

  tree = _tree_topology(mjm.body_parentid, mjm.dof_bodyid, mjm.dof_parentid,
                        mjm.body_dofadr, mjm.body_dofnum, mjm.nv,
                        mjm.dof_jntid, mjm.jnt_type, mjm.jnt_dofadr)
  con = _contact_meta(mjm)
  efc = _efc_meta(mjm, con, int(mjm.opt.cone))
  (act_dyntype, act_gaintype, act_biastype, act_slots, act_wrapprd,
   act_group, act_blocks) = _actuator_meta(mjm)
  (act_ctrladr, act_ctrlnum, act_outadr, act_outnum, act_ctrlspec,
   act_trntype) = act_blocks
  flx = _flex_meta(mjm)
  if (np.asarray(flx.interp) >= 1).any() and \
      (int(mjm.opt.enableflags) & int(EnableBit.SLEEP)):
    raise NotImplementedError(
        "sleep with interpolated flexes (node-tree sleep accounting)")

  opt = Option(
      timestep=jx(mjm.opt.timestep),
      gravity=jx(mjm.opt.gravity),
      wind=jx(mjm.opt.wind),
      magnetic=jx(mjm.opt.magnetic),
      density=jx(mjm.opt.density),
      viscosity=jx(mjm.opt.viscosity),
      impratio=jx(mjm.opt.impratio),
      tolerance=jx(mjm.opt.tolerance),
      ls_tolerance=jx(mjm.opt.ls_tolerance),
      sleep_tolerance=jx(getattr(mjm.opt, "sleep_tolerance", 0.0)),
      integrator=int(mjm.opt.integrator),
      cone=int(mjm.opt.cone),
      solver=int(mjm.opt.solver),
      iterations=int(mjm.opt.iterations),
      ls_iterations=int(mjm.opt.ls_iterations),
      noslip_iterations=int(mjm.opt.noslip_iterations),
      disableflags=int(mjm.opt.disableflags),
      enableflags=int(mjm.opt.enableflags),
      disableactuator=int(getattr(mjm.opt, "disableactuator", 0)),
  )

  return Model(
      nq=int(mjm.nq), nv=int(mjm.nv), nu=int(mjm.nu), na=int(mjm.na),
      nbody=int(mjm.nbody), njnt=int(mjm.njnt), ngeom=int(mjm.ngeom),
      nsite=int(mjm.nsite), neq=int(mjm.neq), ntendon=int(mjm.ntendon),
      nwrap=int(mjm.nwrap), nsensor=int(mjm.nsensor),
      nsensordata=int(mjm.nsensordata), nmocap=int(mjm.nmocap),
      nkey=int(mjm.nkey),
      ncam=int(mjm.ncam), nlight=int(mjm.nlight),
      nhfield=int(mjm.nhfield),
      has_dof_damping=bool(np.any(np.asarray(mjm.dof_damping) > 0)),
      has_fluid=bool(mjm.opt.density > 0 or mjm.opt.viscosity > 0),
      has_tendon_armature=bool(
          np.any(np.asarray(getattr(mjm, 'tendon_armature',
                                    np.zeros(mjm.ntendon))) > 0)),
      has_actgravcomp=bool(
          np.any(np.asarray(getattr(mjm, 'jnt_actgravcomp',
                                    np.zeros(mjm.njnt))))),
      has_flex=flx.nflex > 0,
      flx=flx,
      flex_vert=jx(np.asarray(getattr(mjm, 'flex_vert',
                                      np.zeros((0, 3)))).reshape(-1, 3)),
      flex_node=jx(np.asarray(getattr(mjm, 'flex_node',
                                      np.zeros((0, 3)))).reshape(-1, 3)),
      flex_rgba=jx(np.asarray(getattr(
          mjm, 'flex_rgba',
          np.tile([0.5, 0.5, 0.5, 1.0],
                  (flx.nflex, 1)))).reshape(-1, 4)),
      flex_node0=jx(np.asarray(getattr(mjm, 'flex_node0',
                                       np.zeros((0, 3)))).reshape(-1, 3)),
      flex_stiffness_interp=jx(
          np.asarray(getattr(mjm, 'flex_stiffness', np.zeros(0)))
          if (np.asarray(flx.interp) >= 1).any()
          else np.zeros(0)),
      flex_radius=jx(getattr(mjm, 'flex_radius', np.zeros(0))),
      flexedge_length0=jx(getattr(mjm, 'flexedge_length0', np.zeros(0))),
      flexedge_invweight0=jx(getattr(mjm, 'flexedge_invweight0',
                                     np.zeros(0))),
      flex_edgestiffness=jx(getattr(mjm, 'flex_edgestiffness', np.zeros(0))),
      flex_edgedamping=jx(getattr(mjm, 'flex_edgedamping', np.zeros(0))),
      flex_damping=jx(getattr(mjm, 'flex_damping', np.zeros(0))),
      flex_friction=jx(np.asarray(getattr(mjm, 'flex_friction',
                                          np.zeros((0, 3)))).reshape(-1, 3)),
      flex_solref=jx(np.asarray(getattr(mjm, 'flex_solref',
                                        np.zeros((0, 2)))).reshape(-1, 2)),
      flex_solimp=jx(np.asarray(getattr(mjm, 'flex_solimp',
                                        np.zeros((0, 5)))).reshape(-1, 5)),
      flex_margin=jx(getattr(mjm, 'flex_margin', np.zeros(0))),
      flex_gap=jx(getattr(mjm, 'flex_gap', np.zeros(0))),
      flex_solmix=jx(getattr(mjm, 'flex_solmix', np.zeros(0))),
      flex_stiffness=jx(_flex_stiffness_dense(mjm, flx)),
      flex_bending=jx(_flex_bending_dense(mjm, flx)),
      opt=opt, stat_meaninertia=jx(mjm.stat.meaninertia),
      tree=tree, con=con, efc=efc,
      qpos0=jx(mjm.qpos0), qpos_spring=jx(mjm.qpos_spring),
      body_parentid=si(mjm.body_parentid),
      body_rootid=si(mjm.body_rootid),
      body_weldid=si(mjm.body_weldid),
      body_jntnum=si(mjm.body_jntnum), body_jntadr=si(mjm.body_jntadr),
      body_dofnum=si(mjm.body_dofnum), body_dofadr=si(mjm.body_dofadr),
      body_geomnum=si(mjm.body_geomnum), body_geomadr=si(mjm.body_geomadr),
      body_mocapid=si(mjm.body_mocapid),
      body_pos=jx(mjm.body_pos), body_quat=jx(mjm.body_quat),
      body_ipos=jx(mjm.body_ipos), body_iquat=jx(mjm.body_iquat),
      body_mass=jx(mjm.body_mass), body_subtreemass=jx(mjm.body_subtreemass),
      body_inertia=jx(mjm.body_inertia),
      body_invweight0=jx(mjm.body_invweight0),
      body_gravcomp=jx(mjm.body_gravcomp),
      jnt_type=si(mjm.jnt_type), jnt_qposadr=si(mjm.jnt_qposadr),
      jnt_dofadr=si(mjm.jnt_dofadr), jnt_bodyid=si(mjm.jnt_bodyid),
      jnt_limited=si(mjm.jnt_limited),
      jnt_actfrclimited=si(mjm.jnt_actfrclimited),
      jnt_actgravcomp=si(getattr(mjm, "jnt_actgravcomp",
                                 np.zeros(mjm.njnt))),
      jnt_solref=jx(mjm.jnt_solref), jnt_solimp=jx(mjm.jnt_solimp),
      jnt_pos=jx(mjm.jnt_pos), jnt_axis=jx(mjm.jnt_axis),
      jnt_stiffness=jx(mjm.jnt_stiffness), jnt_range=jx(mjm.jnt_range),
      jnt_actfrcrange=jx(mjm.jnt_actfrcrange), jnt_margin=jx(mjm.jnt_margin),
      dof_bodyid=si(mjm.dof_bodyid), dof_jntid=si(mjm.dof_jntid),
      dof_parentid=si(mjm.dof_parentid),
      dof_armature=jx(mjm.dof_armature), dof_damping=jx(mjm.dof_damping),
      dof_invweight0=jx(mjm.dof_invweight0),
      dof_frictionloss=jx(mjm.dof_frictionloss),
      dof_solref=jx(mjm.dof_solref), dof_solimp=jx(mjm.dof_solimp),
      geom_type=si(mjm.geom_type), geom_contype=si(mjm.geom_contype),
      geom_conaffinity=si(mjm.geom_conaffinity),
      geom_condim=si(mjm.geom_condim), geom_bodyid=si(mjm.geom_bodyid),
      geom_dataid=si(mjm.geom_dataid), geom_priority=si(mjm.geom_priority),
      geom_group=si(mjm.geom_group),
      **_sleep_meta(mjm),
      dof_length=jx(getattr(mjm, "dof_length", np.ones(mjm.nv))),
      geom_rgba=jx(getattr(mjm, "geom_rgba", np.ones((mjm.ngeom, 4)))),
      geom_solmix=jx(mjm.geom_solmix), geom_solref=jx(mjm.geom_solref),
      geom_solimp=jx(mjm.geom_solimp), geom_size=jx(mjm.geom_size),
      geom_rbound=jx(mjm.geom_rbound), geom_pos=jx(mjm.geom_pos),
      geom_quat=jx(mjm.geom_quat), geom_friction=jx(mjm.geom_friction),
      geom_margin=jx(mjm.geom_margin), geom_gap=jx(mjm.geom_gap),
      geom_fluid=jx(mjm.geom_fluid),
      geom_has_fluid=np.asarray(mjm.geom_fluid)[:, 0] > 0,
      site_bodyid=si(mjm.site_bodyid),
      site_type=si(mjm.site_type), site_size=jx(mjm.site_size),
      site_pos=jx(mjm.site_pos), site_quat=jx(mjm.site_quat),
      pair_dim=si(mjm.pair_dim),
      pair_geom1=si(mjm.pair_geom1), pair_geom2=si(mjm.pair_geom2),
      pair_solref=jx(mjm.pair_solref),
      pair_solreffriction=jx(mjm.pair_solreffriction),
      pair_solimp=jx(mjm.pair_solimp),
      pair_margin=jx(mjm.pair_margin), pair_gap=jx(mjm.pair_gap),
      pair_friction=jx(mjm.pair_friction),
      eq_type=si(mjm.eq_type), eq_obj1id=si(mjm.eq_obj1id),
      eq_obj2id=si(mjm.eq_obj2id), eq_objtype=si(mjm.eq_objtype),
      eq_active0=np.array(mjm.eq_active0, dtype=bool),
      eq_solref=jx(mjm.eq_solref), eq_solimp=jx(mjm.eq_solimp),
      eq_data=jx(mjm.eq_data),
      tendon_adr=si(mjm.tendon_adr), tendon_num=si(mjm.tendon_num),
      tendon_limited=si(mjm.tendon_limited),
      tendon_solref_lim=jx(mjm.tendon_solref_lim),
      tendon_solimp_lim=jx(mjm.tendon_solimp_lim),
      tendon_solref_fri=jx(mjm.tendon_solref_fri),
      tendon_solimp_fri=jx(mjm.tendon_solimp_fri),
      tendon_range=jx(mjm.tendon_range), tendon_margin=jx(mjm.tendon_margin),
      tendon_armature=jx(getattr(mjm, 'tendon_armature',
                                 np.zeros(mjm.ntendon))),
      tendon_stiffness=jx(mjm.tendon_stiffness),
      tendon_damping=jx(mjm.tendon_damping),
      tendon_frictionloss=jx(mjm.tendon_frictionloss),
      tendon_lengthspring=jx(mjm.tendon_lengthspring),
      tendon_length0=jx(mjm.tendon_length0),
      tendon_invweight0=jx(mjm.tendon_invweight0),
      wrap_type=si(mjm.wrap_type), wrap_objid=si(mjm.wrap_objid),
      wrap_sideid=np.round(np.asarray(mjm.wrap_prm)).astype(np.int32),
      wrap_prm=jx(mjm.wrap_prm),
      actuator_trntype=act_trntype,
      nctrl=int(act_ctrlnum.sum()),
      nout=int(act_outnum.sum()),
      actuator_ctrladr=act_ctrladr,
      actuator_ctrlnum=act_ctrlnum,
      actuator_outadr=act_outadr,
      actuator_outnum=act_outnum,
      actuator_ctrlspec=act_ctrlspec,
      actuator_dyntype=act_dyntype,
      actuator_gaintype=act_gaintype,
      actuator_biastype=act_biastype,
      actuator_slots=act_slots,
      actuator_wrapprd=act_wrapprd,
      actuator_group=act_group,
      actuator_trnid=si(mjm.actuator_trnid),
      actuator_actadr=si(mjm.actuator_actadr),
      actuator_actnum=si(mjm.actuator_actnum),
      actuator_ctrllimited=si(mjm.actuator_ctrllimited),
      actuator_forcelimited=si(mjm.actuator_forcelimited),
      actuator_actlimited=si(mjm.actuator_actlimited),
      actuator_actearly=si(mjm.actuator_actearly),
      actuator_dynprm=jx(mjm.actuator_dynprm),
      actuator_gainprm=jx(mjm.actuator_gainprm),
      actuator_biasprm=jx(mjm.actuator_biasprm),
      actuator_ctrlrange=jx(mjm.actuator_ctrlrange),
      actuator_forcerange=jx(mjm.actuator_forcerange),
      actuator_actrange=jx(mjm.actuator_actrange),
      actuator_gear=jx(mjm.actuator_gear),
      actuator_cranklength=jx(mjm.actuator_cranklength),
      actuator_acc0=jx(mjm.actuator_acc0),
      actuator_lengthrange=jx(mjm.actuator_lengthrange),
      mesh_vertadr=si(mjm.mesh_vertadr), mesh_vertnum=si(mjm.mesh_vertnum),
      mesh_faceadr=si(mjm.mesh_faceadr), mesh_facenum=si(mjm.mesh_facenum),
      mesh_face=si(mjm.mesh_face),
      mesh_vert=jx(mjm.mesh_vert),
      mesh_hull_idx=_mesh_hulls(mjm),
      user_cb=_user_callbacks(),
      vis_meta=_vis_meta_of(mjm),
      mesh_normal=jx(np.asarray(getattr(mjm, "mesh_normal",
                                        np.zeros((0, 3)))).reshape(-1, 3)),
      mesh_normaladr=_opt_i(mjm, "mesh_normaladr",
                            (len(np.asarray(mjm.mesh_vertadr)),)),
      mesh_normalnum=_opt_i(mjm, "mesh_normalnum",
                            (len(np.asarray(mjm.mesh_vertadr)),)),
      hfield_adr=si(mjm.hfield_adr), hfield_nrow=si(mjm.hfield_nrow),
      hfield_ncol=si(mjm.hfield_ncol),
      hfield_size_np=np.asarray(mjm.hfield_size, dtype=np.float64).reshape(-1, 4),
      hfield_data=jx(mjm.hfield_data),
      cam_bodyid=si(mjm.cam_bodyid),
      cam_targetbodyid=si(mjm.cam_targetbodyid),
      cam_mode=si(mjm.cam_mode),
      cam_pos=jx(mjm.cam_pos), cam_quat=jx(mjm.cam_quat),
      cam_pos0=jx(mjm.cam_pos0), cam_poscom0=jx(mjm.cam_poscom0),
      cam_mat0=jx(np.asarray(mjm.cam_mat0).reshape(-1, 3, 3)),
      cam_fovy=jx(mjm.cam_fovy),
      cam_resolution=si(mjm.cam_resolution),
      cam_projection=si(getattr(mjm, "cam_projection",
                                np.zeros(mjm.ncam, dtype=np.int32))),
      cam_intrinsic=jx(mjm.cam_intrinsic),
      cam_sensorsize=jx(mjm.cam_sensorsize),
      light_bodyid=si(mjm.light_bodyid),
      light_targetbodyid=si(mjm.light_targetbodyid),
      light_mode=si(mjm.light_mode),
      light_pos=jx(mjm.light_pos), light_dir=jx(mjm.light_dir),
      light_pos0=jx(mjm.light_pos0), light_poscom0=jx(mjm.light_poscom0),
      light_dir0=jx(mjm.light_dir0),
      **_render_fields(mjm, jx, si),
      key_time=jx(mjm.key_time), key_qpos=jx(mjm.key_qpos),
      key_qvel=jx(mjm.key_qvel), key_act=jx(mjm.key_act),
      key_ctrl=jx(mjm.key_ctrl), key_mpos=jx(mjm.key_mpos),
      key_mquat=jx(mjm.key_mquat),
      names=_names(mjm),
      sensor_type=si(mjm.sensor_type),
      sensor_datatype=si(mjm.sensor_datatype),
      sensor_needstage=si(mjm.sensor_needstage),
      sensor_objtype=si(mjm.sensor_objtype),
      sensor_objid=si(mjm.sensor_objid),
      sensor_reftype=si(mjm.sensor_reftype),
      sensor_refid=si(mjm.sensor_refid),
      sensor_dim=si(mjm.sensor_dim), sensor_adr=si(mjm.sensor_adr),
      sensor_intprm=_opt_i(mjm, "sensor_intprm", (mjm.nsensor, 3)),
      sensor_history=_opt_i(mjm, "sensor_history", (mjm.nsensor, 2)),
      sensor_historyadr=_opt_i(mjm, "sensor_historyadr", (mjm.nsensor,), -1),
      sensor_delay=_opt_f(mjm, "sensor_delay", (mjm.nsensor,)),
      sensor_interval=_opt_f(mjm, "sensor_interval", (mjm.nsensor, 2)),
      actuator_history=_opt_i(mjm, "actuator_history", (mjm.nu, 2)),
      actuator_historyadr=_opt_i(mjm, "actuator_historyadr", (mjm.nu,), -1),
      actuator_delay=_opt_f(mjm, "actuator_delay", (mjm.nu,)),
      nhistory=int(getattr(mjm, "nhistory", 0)),
      sensor_cutoff=jx(mjm.sensor_cutoff),
  )


def _sleep_meta(mjm) -> dict:
  """Kinematic-tree sleep metadata (tree_* arrays, engine_sleep.c), with
  dense per-tree dof/body masks replacing the reference's adr/num index
  ranges. Models bridged from sources without tree tables get ntree=0,
  which disables the sleep machinery."""
  ntree = int(getattr(mjm, "ntree", 0))
  if ntree == 0:
    return dict(ntree=0,
                body_treeid=np.full(mjm.nbody, -1, dtype=np.int32),
                dof_treeid=np.full(mjm.nv, -1, dtype=np.int32),
                tree_sleep_policy=np.zeros(0, dtype=np.int32),
                tree_dof_mask=np.zeros((0, mjm.nv), dtype=bool),
                tree_body_mask=np.zeros((0, mjm.nbody), dtype=bool),
                tendon_treeid=np.full((mjm.ntendon, 2), -1, dtype=np.int32),
                tendon_treenum=np.zeros(mjm.ntendon, dtype=np.int32))
  body_treeid = np.asarray(mjm.body_treeid, dtype=np.int32).reshape(-1)
  dof_treeid = np.asarray(mjm.dof_treeid, dtype=np.int32).reshape(-1)
  tree_dof_mask = dof_treeid[None, :] == np.arange(ntree)[:, None]
  tree_body_mask = body_treeid[None, :] == np.arange(ntree)[:, None]
  return dict(
      ntree=ntree, body_treeid=body_treeid, dof_treeid=dof_treeid,
      tree_sleep_policy=np.asarray(mjm.tree_sleep_policy,
                                   dtype=np.int32).reshape(-1),
      tree_dof_mask=tree_dof_mask, tree_body_mask=tree_body_mask,
      tendon_treeid=np.asarray(mjm.tendon_treeid,
                               dtype=np.int32).reshape(-1, 2),
      tendon_treenum=np.asarray(mjm.tendon_treenum,
                                dtype=np.int32).reshape(-1))


def _opt_i(mjm, name, shape, fill=0):
  """Optional int model field (absent on natively-compiled models that
  predate the feature): numpy int32 copy or a fill-constant array."""
  v = getattr(mjm, name, None)
  if v is None:
    return np.full(shape, fill, dtype=np.int32)
  return np.asarray(v, dtype=np.int32).reshape(shape)


def _opt_f(mjm, name, shape):
  v = getattr(mjm, name, None)
  if v is None:
    return np.zeros(shape, dtype=np.float64)
  return np.asarray(v, dtype=np.float64).reshape(shape)


def _neutral_ctrl(m: Model, dtype):
  """Neutral controls: zeros, except SO3 quat-chart blocks whose leading
  component is 1 = identity orientation (mj_resetData, engine_io.c:1646)."""
  from mujoco_tpu.models.types import CtrlChart, GainType
  ctrl = np.zeros((m.nctrl,))
  for i in range(m.nu):
    if (int(m.actuator_gaintype[i]) == int(GainType.SO3)
        and int(m.actuator_ctrlspec[i]) == int(CtrlChart.QUAT)):
      ctrl[int(m.actuator_ctrladr[i])] = 1.0
  return jnp.asarray(ctrl, dtype=dtype)


def _mocap_init(m: Model, dtype):
  """(mocap_pos, mocap_quat) at the mocap bodies' model poses, ordered by
  mocapid (mj_resetData's mocap initialization). Static index table +
  traced gather, so make_data stays jit-compatible."""
  if not m.nmocap:
    return (jnp.zeros((0, 3), dtype=dtype),
            jnp.zeros((0, 4), dtype=dtype))
  mid = np.asarray(m.body_mocapid)
  body_of = np.zeros(m.nmocap, dtype=np.int32)
  for b in np.nonzero(mid >= 0)[0]:
    body_of[mid[b]] = b
  idx = jnp.asarray(body_of)
  return (jnp.asarray(m.body_pos, dtype=dtype)[idx],
          jnp.asarray(m.body_quat, dtype=dtype)[idx])


def make_data(m: Model, dtype=None) -> Data:
  """Allocate a zero-initialized Data at qpos0 (counterpart of mj_makeData,
  /root/reference/src/engine/engine_io.c:227 — no arena needed, XLA owns
  buffers)."""
  dtype = dtype or m.qpos0.dtype
  z = lambda *shape: jnp.zeros(shape, dtype=dtype)
  nb, nv, nq = m.nbody, m.nv, m.nq
  ncon, nefc = m.con.ncon, m.efc.nefc

  eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (nb, 3, 3))
  quat0 = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=dtype), (nb, 1))

  contact = Contact(
      dist=jnp.full((ncon,), 1e10, dtype=dtype),
      pos=z(ncon, 3),
      frame=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (ncon, 3, 3)),
      includemargin=z(ncon),
      friction=jnp.tile(jnp.array([1, 1, 0.005, 0.0001, 0.0001],
                                  dtype=dtype), (ncon, 1)),
      solref=jnp.tile(jnp.array([0.02, 1.0], dtype=dtype), (ncon, 1)),
      solreffriction=z(ncon, 2),
      solimp=jnp.tile(jnp.array([0.9, 0.95, 0.001, 0.5, 2.0], dtype=dtype),
                      (ncon, 1)),
      mu=z(ncon),
      flexvert=jnp.full((ncon, 4), -1, dtype=jnp.int32),
      flexvert1=jnp.full((ncon, 4), -1, dtype=jnp.int32),
      geomids=jnp.stack([jnp.asarray(m.con.geom1, dtype=jnp.int32),
                         jnp.asarray(m.con.geom2, dtype=jnp.int32)], axis=-1)
      if ncon else jnp.zeros((0, 2), dtype=jnp.int32),
  )

  return Data(
      time=z(), qpos=jnp.array(m.qpos0, dtype=dtype), qvel=z(nv),
      act=z(m.na), ctrl=_neutral_ctrl(m, dtype), qfrc_applied=z(nv),
      xfrc_applied=z(nb, 6),
      eq_active=jnp.asarray(m.eq_active0),
      # mocap bodies start at their model pose (mj_resetData,
      # engine_io.c: d->mocap_pos = m->body_pos of the mocap body)
      mocap_pos=_mocap_init(m, dtype)[0],
      mocap_quat=_mocap_init(m, dtype)[1],
      qacc_warmstart=z(nv),
      xpos=z(nb, 3), xquat=quat0, xmat=eye3,
      xipos=z(nb, 3), ximat=eye3,
      xanchor=z(m.njnt, 3), xaxis=z(m.njnt, 3),
      geom_xpos=z(m.ngeom, 3),
      geom_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (m.ngeom, 3, 3)),
      site_xpos=z(m.nsite, 3),
      site_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (m.nsite, 3, 3)),
      cam_xpos=z(m.ncam, 3),
      cam_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (m.ncam, 3, 3)),
      light_xpos=z(m.nlight, 3), light_xdir=z(m.nlight, 3),
      subtree_com=z(nb, 3), cinert=z(nb, 6, 6), cdof=z(nv, 6),
      crb=z(nb, 6, 6), qM=z(nv, nv), qLD=z(nv, nv), qLDiagInv=z(nv),
      ten_length=z(m.ntendon), ten_J=z(m.ntendon, nv),
      flexvert_xpos=z(m.flx.nvert, 3), flexedge_length=z(m.flx.nedge),
      flexedge_velocity=z(m.flx.nedge), flexedge_J=z(m.flx.nedge, nv),
      actuator_length=z(m.nout), actuator_moment=z(m.nout, nv),
      contact=contact,
      cvel=z(nb, 6), cdof_dot=z(nv, 6), qfrc_bias=z(nv),
      ten_velocity=z(m.ntendon), actuator_velocity=z(m.nout),
      qfrc_spring=z(nv), qfrc_damper=z(nv), qfrc_gravcomp=z(nv),
      qfrc_fluid=z(nv), qfrc_passive=z(nv),
      act_dot=z(m.na), actuator_force=z(m.nout), qfrc_actuator=z(nv),
      qfrc_smooth=z(nv), qacc_smooth=z(nv),
      efc_J=z(nefc, nv), efc_pos=z(nefc), efc_margin=z(nefc),
      efc_D=z(nefc), efc_R=z(nefc), efc_aref=z(nefc),
      efc_frictionloss=z(nefc),
      efc_KBIP=z(nefc, 4),
      efc_active=jnp.zeros((nefc,), dtype=bool),
      efc_force=z(nefc), qfrc_constraint=z(nv), qacc=z(nv),
      qfrc_inverse=z(nv),
      cacc=z(nb, 6), cfrc_int=z(nb, 6), cfrc_ext=z(nb, 6),
      subtree_linvel=z(nb, 3), subtree_angmom=z(nb, 3),
      sensordata=z(m.nsensordata),
      energy=z(2),
      solver_stat=z(32, 2),
      solver_niter=jnp.zeros((), dtype=jnp.int32),
      warning=jnp.zeros((2,), dtype=jnp.int32),
      history=jnp.asarray(_init_history(m), dtype=dtype),
      # fully awake: -(1+mjMINAWAKE) (mj_resetData, engine_io.c:1460).
      # SLEEP_INIT trees need a forward pass to fall asleep — use
      # state.init_sleep after make_data (documented deviation: the
      # reference runs it inside reset).
      tree_asleep=jnp.full((m.ntree,), -11, dtype=jnp.int32),
  )


def _init_history(m: Model) -> np.ndarray:
  """Reset-state history buffers (mj_resetData, engine_io.c:1405-1454):
  per-buffer layout [user, cursor, times(n), values(n*dim)], timestamps
  seeded in the past so reads before the first insert extrapolate zeros."""
  buf = np.zeros((m.nhistory,), dtype=np.float64)
  if m.nhistory == 0:
    return buf
  dt = float(np.asarray(m.opt.timestep))
  for i in range(m.nu):
    n = int(m.actuator_history[i, 0])
    if n <= 0:
      continue
    adr = int(m.actuator_historyadr[i])
    buf[adr] = 0.0
    buf[adr + 1] = n - 1
    buf[adr + 2:adr + 2 + n] = [-(n - j) * dt for j in range(n)]
  for i in range(m.nsensor):
    n = int(m.sensor_history[i, 0])
    if n <= 0:
      continue
    adr = int(m.sensor_historyadr[i])
    period, phase = float(m.sensor_interval[i, 0]), float(m.sensor_interval[i, 1])
    buf[adr] = ((-period if phase == 0 else phase) if period > 0 else -dt)
    buf[adr + 1] = n - 1
    if period > 0:
      t0 = -period if phase == 0 else phase
      buf[adr + 2:adr + 2 + n] = [
          np.ceil((t0 - (n - 1 - j) * period) / dt) * dt for j in range(n)]
    else:
      buf[adr + 2:adr + 2 + n] = [-(n - j) * dt for j in range(n)]
  return buf


def get_data_into(mjd: Any, mjm: Any, d) -> None:
  """Copy a (single-env) Data back into a mujoco.MjData — the viewer/render
  bridge (counterpart of mjx.get_data_into,
  /root/reference/mjx/mujoco/mjx/_src/io.py:1592): state and key derived
  quantities are copied, then mj_forward fills anything downstream so
  mjv_updateScene / renderers see a consistent mjData."""
  import mujoco
  import numpy as np_

  def h(x):
    return np_.asarray(x, dtype=np_.float64)

  mjd.time = float(d.time)
  mjd.qpos[:] = h(d.qpos)
  mjd.qvel[:] = h(d.qvel)
  if mjm.na:
    mjd.act[:] = h(d.act)
  if mjm.nu:
    mjd.ctrl[:] = h(d.ctrl)
  mjd.qacc[:] = h(d.qacc)
  mjd.qacc_warmstart[:] = h(d.qacc_warmstart)
  mjd.qfrc_applied[:] = h(d.qfrc_applied)
  mjd.xfrc_applied[:] = h(d.xfrc_applied)
  if getattr(mjm, "nhistory", 0) and d.history.shape[0] == mjm.nhistory:
    mjd.history[:] = h(d.history)
  if mjm.nmocap:
    mjd.mocap_pos[:] = h(d.mocap_pos)
    mjd.mocap_quat[:] = h(d.mocap_quat)
  if mjm.neq:
    mjd.eq_active[:] = np_.asarray(d.eq_active).astype(np_.uint8)
  # recompute all derived quantities with the C engine for visualization
  mujoco.mj_forward(mjm, mjd)


def get_data(mjm: Any, d):
  """New mjData populated from a Data (see get_data_into)."""
  import mujoco
  mjd = mujoco.MjData(mjm)
  get_data_into(mjd, mjm, d)
  return mjd
