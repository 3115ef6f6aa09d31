"""mjv-lite: abstract scene export (mjv_updateScene analog).

Counterpart of the reference visualization abstraction
(/root/reference/src/engine/engine_vis_visualize.c: mjv_updateScene:1837,
addContactGeoms:583, mjv_connector:259): one pure function turns (Model,
Data) into a fixed-shape table of visual geoms — model geoms plus contact
point/force glyphs — consumed by both the on-device ray renderer
(ops/render.render_scene) and the host-side viewer bridge
(update_scene_into, which fills a mujoco.MjvScene for the reference
viewer). TPU redesign: the scene is a pytree with static per-slot types and
traced pose/size/color plus an active mask, so it jits, vmaps over envs,
and differentiates like any other engine output.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mujoco_tpu.models.types import Data, GeomType, Model
from mujoco_tpu.utils import math as mjm
from mujoco_tpu.utils.struct import pytree_dataclass, static_field, field


# glyph categories (mjtCatBit analog: model geoms are mjCAT_DYNAMIC/STATIC,
# glyphs are mjCAT_DECOR)
CAT_GEOM = 0
CAT_CONTACT_POINT = 1
CAT_CONTACT_FORCE = 2


@pytree_dataclass
class Scene:
  """Fixed-shape visual geom table (mjvScene/mjvGeom analog)."""
  geom_type: np.ndarray = static_field()   # (N,) int — GeomType per slot
  category: np.ndarray = static_field()    # (N,) int — CAT_* per slot
  objid: np.ndarray = static_field()       # (N,) source geom/contact id
  pos: jax.Array = field()                 # (N, 3)
  mat: jax.Array = field()                 # (N, 3, 3)
  size: jax.Array = field()                # (N, 3)
  rgba: jax.Array = field()                # (N, 4)
  active: jax.Array = field()              # (N,) bool

  @property
  def nslot(self):
    return len(self.geom_type)


def _vis_meta(m: Model) -> dict:
  return m.vis_meta


def update_scene(m: Model, d: Data, contact_points: bool = True,
                 contact_forces: bool = False) -> Scene:
  """Build the scene table at the current state (mjv_updateScene analog).

  Slots: ngeom model geoms, then ncon contact-point cylinders
  (addContactGeoms, engine_vis_visualize.c:607: radius/half-height from
  vis.scale.contactwidth/contactheight × stat.meansize, z along the contact
  normal), then ncon contact-force capsules (the mjv_connector arrow's
  axis/length: force × vis.map.force / stat.meanmass). Inactive slots carry
  active=False rather than being absent.
  """
  dtype = d.qpos.dtype
  vm = _vis_meta(m)
  scl = float(vm["meansize"])
  ncon = d.contact.dist.shape[0] if contact_points or contact_forces else 0

  types = list(np.asarray(m.geom_type, dtype=np.int64))
  cats = [CAT_GEOM] * m.ngeom
  objid = list(range(m.ngeom))
  pos = [d.geom_xpos]
  mat = [d.geom_xmat]
  size = [m.geom_size]
  # material resolution (setMaterial, engine_vis_visualize.c:225-247):
  # material rgba unless the geom rgba differs from the 0.5/0.5/0.5/1
  # default or there is no material
  grgba = m.geom_rgba
  if int(getattr(m, "nmat", 0)):
    default = jnp.asarray([0.5, 0.5, 0.5, 1.0], dtype=dtype)
    explicit = jnp.any(jnp.abs(grgba - default) > 1e-7, axis=1)
    matid = jnp.asarray(np.asarray(m.geom_matid), dtype=jnp.int32)
    mrgba = jnp.where((matid >= 0)[:, None],
                      m.mat_rgba[jnp.maximum(matid, 0)].astype(dtype), grgba)
    grgba = jnp.where(explicit[:, None], grgba, mrgba)
  rgba = [grgba]
  active = [jnp.ones((m.ngeom,), dtype=bool)]

  if ncon:
    con = d.contact
    is_active = con.dist < con.includemargin
    # contact frame rows are [n; t1; t2]; the glyph matrix has columns
    # [t1, t2, n] so the cylinder axis (z) is the contact normal
    # (addContactGeoms' transpose, engine_vis_visualize.c:602-604)
    gmat = jnp.stack([con.frame[:, 1], con.frame[:, 2], con.frame[:, 0]],
                     axis=-1)

  if ncon and contact_points:
    w = float(vm["contactwidth"]) * scl
    h = float(vm["contactheight"]) * scl
    types += [int(GeomType.CYLINDER)] * ncon
    cats += [CAT_CONTACT_POINT] * ncon
    objid += list(range(ncon))
    pos.append(con.pos)
    mat.append(gmat)
    halfdepth = jnp.maximum(h, -con.dist / 2)
    size.append(jnp.stack([jnp.full((ncon,), w, dtype=dtype),
                           jnp.full((ncon,), w, dtype=dtype),
                           halfdepth], axis=-1))
    rgba.append(jnp.broadcast_to(
        jnp.asarray(vm["rgba_contactpoint"], dtype=dtype), (ncon, 4)))
    active.append(is_active)

  if ncon and contact_forces:
    from mujoco_tpu.ops.sensor import contact_force
    ft = contact_force(m, d)                       # (ncon, 6) contact frame
    fworld = jnp.einsum("cij,cj->ci", con.frame.transpose(0, 2, 1),
                        ft[:, :3])
    vec = fworld * (float(vm["map_force"]) / max(float(vm["meanmass"]),
                                                 1e-12))
    length = mjm.norm_safe(vec)
    zaxis = vec / jnp.maximum(length, mjm.MINVAL)[:, None]
    # complete a frame around the arrow axis
    ref = jnp.where(jnp.abs(zaxis[:, 2:3]) < 0.9,
                    jnp.broadcast_to(jnp.asarray([0.0, 0, 1], dtype=dtype),
                                     (ncon, 3)),
                    jnp.broadcast_to(jnp.asarray([1.0, 0, 0], dtype=dtype),
                                     (ncon, 3)))
    x = mjm.normalize(jnp.cross(ref, zaxis))
    y = jnp.cross(zaxis, x)
    amat = jnp.stack([x, y, zaxis], axis=-1)
    w = float(vm["forcewidth"]) * scl
    types += [int(GeomType.CAPSULE)] * ncon
    cats += [CAT_CONTACT_FORCE] * ncon
    objid += list(range(ncon))
    pos.append(con.pos + 0.5 * vec)                # capsule centered on arrow
    mat.append(amat)
    size.append(jnp.stack([jnp.full((ncon,), w, dtype=dtype),
                           length / 2,
                           jnp.zeros((ncon,), dtype=dtype)], axis=-1))
    rgba.append(jnp.broadcast_to(
        jnp.asarray(vm["rgba_contactforce"], dtype=dtype), (ncon, 4)))
    active.append(is_active & (length > mjm.MINVAL))

  return Scene(
      geom_type=np.asarray(types, dtype=np.int32),
      category=np.asarray(cats, dtype=np.int32),
      objid=np.asarray(objid, dtype=np.int32),
      pos=jnp.concatenate(pos, axis=0),
      mat=jnp.concatenate(mat, axis=0),
      size=jnp.concatenate(size, axis=0),
      rgba=jnp.concatenate(rgba, axis=0),
      active=jnp.concatenate(active, axis=0),
  )


def update_scene_into(m: Model, d: Data, scn, catmask: int = 7) -> int:
  """Fill a ``mujoco.MjvScene`` from the mjv-lite table (host-side viewer
  bridge; the mjv_updateScene call the reference viewer performs). Returns
  the number of geoms written. Model geoms are skipped when the caller uses
  the reference's own scene update for them (catmask without CAT_GEOM)."""
  import mujoco

  scene = update_scene(m, d, contact_points=True, contact_forces=True)
  types = scene.geom_type
  cats = scene.category
  pos = np.asarray(scene.pos, dtype=np.float64)
  mat = np.asarray(scene.mat, dtype=np.float64)
  size = np.asarray(scene.size, dtype=np.float64)
  rgba = np.asarray(scene.rgba, dtype=np.float32)
  active = np.asarray(scene.active)

  # our capsule half-length convention → mjv capsule size
  n0 = scn.ngeom
  for i in range(scene.nslot):
    if not active[i] or not (catmask & (1 << int(cats[i]))):
      continue
    if scn.ngeom >= scn.maxgeom:
      break
    g = scn.geoms[scn.ngeom]
    mujoco.mjv_initGeom(g, int(types[i]), size[i], pos[i],
                        mat[i].ravel(), rgba[i])
    if int(types[i]) == int(GeomType.CAPSULE):
      g.size[2] = size[i][1]      # mjv capsules store half-length in size[2]
      g.size[1] = size[i][0]
    scn.ngeom += 1
  return scn.ngeom - n0


def apply_perturb_force(m: Model, d: Data, body: int, localpos, refselpos,
                        refquat=None, localmass: float = 1.0,
                        translate: bool = True, rotate: bool = False):
  """Mouse-perturbation force/torque on a selected body → new xfrc_applied
  (mjv_applyPerturbForce, engine_vis_interact.c:717-784): critically damped
  spring from the selection point to the reference point
  (vis.map.stiffness = 100), plus torsional damping; rotate mode drives the
  body inertia quaternion toward refquat (stiffnessrot = 500).

  Pure jax function of traced (d, refselpos, refquat): jit/vmap it to drive
  batched envs interactively."""
  import jax.numpy as jnp
  dtype = d.qpos.dtype
  stiffness = 100.0                     # mjVisual.map defaults
  stiffnessrot = 500.0

  ang = d.cvel[body, :3]
  lin = (d.cvel[body, 3:]
         + jnp.cross(ang, d.xipos[body]
                     - d.subtree_com[m.body_rootid[body]]))
  invweight = m.body_invweight0[body, 1]
  inertia = jnp.where(invweight > 0,
                      1.0 / jnp.maximum(invweight, 1e-15), 1.0)

  force = jnp.zeros(3, dtype=dtype)
  torque = jnp.zeros(3, dtype=dtype)
  if translate:
    selpos = d.xpos[body] + d.xmat[body] @ jnp.asarray(localpos,
                                                       dtype=dtype)
    diff = selpos - jnp.asarray(refselpos, dtype=dtype)
    force = -stiffness * localmass * diff
    arm = selpos - d.xipos[body]
    svel = lin + jnp.cross(ang, arm)
    force = force - jnp.sqrt(stiffness) * localmass * svel
    torque = jnp.cross(arm, force)
    diffn = diff / jnp.maximum(jnp.linalg.norm(diff), 1e-15)
    torque = torque - (jnp.sqrt(stiffnessrot) * inertia
                       * jnp.dot(diffn, ang)) * diffn
  if rotate and refquat is not None:
    from mujoco_tpu.utils import math as mjmath
    xiquat = mjmath.mul_quat(d.xquat[body], m.body_iquat[body])
    difquat = mjmath.mul_quat(jnp.asarray(refquat, dtype=dtype),
                              mjmath.conj_quat(xiquat))
    torque = (mjmath.quat_to_vel(difquat) * (stiffnessrot * inertia)
              - jnp.sqrt(stiffnessrot) * inertia * ang)
  xfrc = d.xfrc_applied.at[body, :3].set(force)
  xfrc = xfrc.at[body, 3:].set(torque)
  return d.replace(xfrc_applied=xfrc)
