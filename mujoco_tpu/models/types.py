"""Model and Data pytrees — the two flat structures everything operates on.

Mirrors the reference's architectural invariant: an immutable model (sizes +
constant arrays, /root/reference/include/mujoco/mjmodel.h:242) and a mutable
state+workspace struct (/root/reference/include/mujoco/mjdata.h:99), reshaped
for TPU:

  * structural fields (sizes, types, topology, index tables) are numpy and
    live in static pytree aux data → recompile when they change;
  * numeric fields are jax leaves → traced, vmappable for per-env domain
    randomization (reference precedent: per-env models in rollout,
    /root/reference/python/mujoco/rollout.cc:242);
  * instead of sparse index chasing, topology is exposed as *dense masks*
    (ancestor/subtree) so tree algorithms become MXU matmuls.

Field names follow the reference's public naming (body_parentid, jnt_type,
...) so users of the reference find the same API surface.
"""

from __future__ import annotations

import enum
from typing import Any, Tuple

import jax
import numpy as np

from mujoco_tpu.utils.struct import field, pytree_dataclass, static_field


# ---------------------------------------------------------------------------
# Enums (values match the reference public API, include/mujoco/mjtype.h)
# ---------------------------------------------------------------------------


class JointType(enum.IntEnum):
  FREE = 0
  BALL = 1
  SLIDE = 2
  HINGE = 3


class GeomType(enum.IntEnum):
  PLANE = 0
  HFIELD = 1
  SPHERE = 2
  CAPSULE = 3
  ELLIPSOID = 4
  CYLINDER = 5
  BOX = 6
  MESH = 7
  SDF = 8


class Integrator(enum.IntEnum):
  EULER = 0
  RK4 = 1
  IMPLICIT = 2
  IMPLICITFAST = 3


class ConeType(enum.IntEnum):
  PYRAMIDAL = 0
  ELLIPTIC = 1


class SolverType(enum.IntEnum):
  PGS = 0
  CG = 1
  NEWTON = 2


class EqType(enum.IntEnum):
  CONNECT = 0
  WELD = 1
  JOINT = 2
  TENDON = 3
  FLEX = 4
  FLEXVERT = 5
  FLEXSTRAIN = 6


class TrnType(enum.IntEnum):
  JOINT = 0
  JOINTINPARENT = 1
  SLIDERCRANK = 2
  TENDON = 3
  SITE = 4
  BODY = 5
  SO3 = 6


class CtrlChart(enum.IntEnum):
  """mjtCtrlChart (mjtype.h:276-279): SO3 input signature."""
  EXPMAP = 1
  QUAT = 2


class DynType(enum.IntEnum):
  """mjtDyn (mjtype.h:243-252, v3.11 values; put_model remaps by name)."""
  NONE = 0
  INTEGRATOR = 1
  FILTER = 2
  FILTEREXACT = 3
  MUSCLE = 4
  DCMOTOR = 5
  PID = 6
  USER = 7


class GainType(enum.IntEnum):
  """mjtGain (mjtype.h:255-263, v3.11 values)."""
  FIXED = 0
  AFFINE = 1
  MUSCLE = 2
  DCMOTOR = 3
  SO3 = 4
  PID = 5
  USER = 6


class BiasType(enum.IntEnum):
  """mjtBias (mjtype.h:266-273, v3.11 values)."""
  NONE = 0
  AFFINE = 1
  MUSCLE = 2
  DCMOTOR = 3
  SO3 = 4
  USER = 5


class WrapType(enum.IntEnum):
  JOINT = 1
  PULLEY = 2
  SITE = 3
  SPHERE = 4
  CYLINDER = 5


class DisableBit(enum.IntFlag):
  """Disable flags, matching mjtDisableBit (mjtype.h)."""
  CONSTRAINT = 1 << 0
  EQUALITY = 1 << 1
  FRICTIONLOSS = 1 << 2
  LIMIT = 1 << 3
  CONTACT = 1 << 4
  SPRING = 1 << 5
  DAMPER = 1 << 6
  GRAVITY = 1 << 7
  CLAMPCTRL = 1 << 8
  WARMSTART = 1 << 9
  FILTERPARENT = 1 << 10
  ACTUATION = 1 << 11
  REFSAFE = 1 << 12
  SENSOR = 1 << 13
  MIDPHASE = 1 << 14
  EULERDAMP = 1 << 15
  AUTORESET = 1 << 16
  NATIVECCD = 1 << 17
  ISLAND = 1 << 18
  MULTICCD = 1 << 19


class EnableBit(enum.IntFlag):
  """Enable flags, matching mjtEnableBit (mjtype.h:80-86)."""
  OVERRIDE = 1 << 0
  ENERGY = 1 << 1
  FWDINV = 1 << 2
  INVDISCRETE = 1 << 3
  SLEEP = 1 << 4
  DIAGEXACT = 1 << 5


class SensorType(enum.IntEnum):
  """mjtSensor (mjtype.h:326-399); values match the reference exactly."""
  TOUCH = 0
  ACCELEROMETER = 1
  VELOCIMETER = 2
  GYRO = 3
  FORCE = 4
  TORQUE = 5
  MAGNETOMETER = 6
  RANGEFINDER = 7
  CAMPROJECTION = 8
  JOINTPOS = 9
  JOINTVEL = 10
  TENDONPOS = 11
  TENDONVEL = 12
  ACTUATORPOS = 13
  ACTUATORVEL = 14
  ACTUATORFRC = 15
  JOINTACTFRC = 16
  TENDONACTFRC = 17
  BALLQUAT = 18
  BALLANGVEL = 19
  JOINTLIMITPOS = 20
  JOINTLIMITVEL = 21
  JOINTLIMITFRC = 22
  TENDONLIMITPOS = 23
  TENDONLIMITVEL = 24
  TENDONLIMITFRC = 25
  FRAMEPOS = 26
  FRAMEQUAT = 27
  FRAMEXAXIS = 28
  FRAMEYAXIS = 29
  FRAMEZAXIS = 30
  FRAMELINVEL = 31
  FRAMEANGVEL = 32
  FRAMELINACC = 33
  FRAMEANGACC = 34
  SUBTREECOM = 35
  SUBTREELINVEL = 36
  SUBTREEANGMOM = 37
  INSIDESITE = 38
  GEOMDIST = 39
  GEOMNORMAL = 40
  GEOMFROMTO = 41
  CONTACT = 42
  E_POTENTIAL = 43
  E_KINETIC = 44
  CLOCK = 45
  TACTILE = 46
  PLUGIN = 47
  USER = 48


class ObjType(enum.IntEnum):
  """mjtObj subset used by sensors/equality (mjtype.h:290-322)."""
  UNKNOWN = 0
  BODY = 1
  XBODY = 2
  JOINT = 3
  DOF = 4
  GEOM = 5
  SITE = 6
  CAMERA = 7
  TENDON = 18
  ACTUATOR = 19


class DataType(enum.IntEnum):
  """mjtDataType: sensor output semantics."""
  REAL = 0
  POSITIVE = 1
  AXIS = 2
  QUATERNION = 3


# ---------------------------------------------------------------------------
# Option
# ---------------------------------------------------------------------------


@pytree_dataclass
class Option:
  """Physics options, mirroring mjOption (mjmodel.h:83-129).

  Scalars that select code paths (integrator, cone, solver, flags, iteration
  budgets) are static; continuous parameters are traced leaves.
  """
  # numeric (traced)
  timestep: jax.Array
  gravity: jax.Array           # (3,)
  wind: jax.Array              # (3,)
  magnetic: jax.Array          # (3,)
  density: jax.Array
  viscosity: jax.Array
  impratio: jax.Array
  tolerance: jax.Array
  ls_tolerance: jax.Array
  sleep_tolerance: jax.Array
  # static (structural)
  integrator: int = static_field(default=int(Integrator.EULER))
  cone: int = static_field(default=int(ConeType.PYRAMIDAL))
  solver: int = static_field(default=int(SolverType.NEWTON))
  iterations: int = static_field(default=100)
  ls_iterations: int = static_field(default=50)
  noslip_iterations: int = static_field(default=0)
  disableflags: int = static_field(default=0)
  enableflags: int = static_field(default=0)
  # actuator-group disable bitmask (mjOption.disableactuator, mjmodel.h:83;
  # bit g disables actuators with actuator_group == g)
  disableactuator: int = static_field(default=0)


# ---------------------------------------------------------------------------
# Static metadata computed at put_model time
# ---------------------------------------------------------------------------


@pytree_dataclass
class TreeTopology:
  """Dense topology masks + per-level tables derived from body_parentid.

  These replace the reference's sparse tree recursions with masked dense
  linear algebra (TPU-first redesign of engine_core_smooth.c's loops):

    ancestor_mask[b, v] = 1 iff dof v supports body b (v on path root→b)
    subtree_mask[b, c]  = 1 iff body c is in the subtree of body b
    levels: tuple of numpy index arrays, bodies grouped by tree depth
  """
  ancestor_mask: np.ndarray = static_field()     # (nbody, nv) bool
  subtree_mask: np.ndarray = static_field()      # (nbody, nbody) bool
  levels: Tuple[np.ndarray, ...] = static_field()
  dof_ancestor_mask: np.ndarray = static_field() # (nv, nv) bool: j anc-or-self of i
  # dof-tree tables for the fill-in-free L'DL' factorization (mj_factorM):
  # dofs grouped by dof-tree depth, and per-dof padded strict-ancestor chains
  # (padded with nv → extra scratch row/col)
  dof_levels: Tuple[np.ndarray, ...] = static_field()
  dof_anc_table: np.ndarray = static_field()     # (nv, maxdepth)
  # cdofdot_mask[j, k]: dof k's velocity contributes to d/dt cdof_j, matching
  # the accumulation order of mj_comVel (engine_core_smooth.c:2179): strict
  # tree-predecessors, excluding same-joint dofs for ball/free rotations
  # (which all use the pre-joint velocity) but including same-joint free
  # translations; all-false rows for free translation dofs (cdofdot = 0).
  cdofdot_mask: np.ndarray = static_field()      # (nv, nv) bool


@pytree_dataclass
class ContactMeta:
  """Static contact slot layout (computed once from geom pair filtering).

  Fixed-shape contact output is the TPU analog of the reference's dynamic
  contact array; precedent: MJX's static type-grouped dispatch and
  max_contact_points (/root/reference/mjx/mujoco/mjx/_src/collision_driver.py).
  Every potential geom pair owns fixed contact slots; inactive slots carry
  dist > 0 and are masked out of the solver.
  """
  ncon: int = static_field()                 # total contact slots
  geom1: np.ndarray = static_field()         # (ncon,) geom id per slot
  geom2: np.ndarray = static_field()
  pair_type: np.ndarray = static_field()     # (ncon, 2) geom types
  condim: np.ndarray = static_field()        # (ncon,)
  # explicit <pair> overrides: -1 = combine from geoms, else pair index
  pairid: np.ndarray = static_field()
  con_first: np.ndarray = static_field()     # (ncon,) bool: first slot of pair
  # flex contact slots (appended after geom-geom slots): flex2 is the flex id
  # (-1 for geom-geom slots, where geom2 is valid); flexpair_* lists the
  # (geom, flex) candidate pairs, each owning `flex_budget` top-K slots
  flex2: np.ndarray = static_field()         # (ncon,)
  flexpair_geom: np.ndarray = static_field() # (nflexpair,)
  flexpair_flex: np.ndarray = static_field() # (nflexpair,)
  flexpair_adr: np.ndarray = static_field()  # (nflexpair,) first slot
  flex_budget: int = static_field()          # K slots per (geom, flex) pair
  # dynamic pair groups — the broadphase-cull analog for large scenes
  # (reference: mj_broadphase SAP, engine_collision_driver.c:1572; fixed-
  # shape precedent: MJX max_geom_pairs top-K cull,
  # mjx/_src/collision_driver.py:405). Each group is a large set of
  # same-signature candidate pairs owning `npair` budgeted PAIR slots
  # (selected per step by bounding-sphere distance); slot geom ids become
  # traced (Contact.geomids). Tuple of dicts with numpy values:
  # {g1, g2: (ncand,), adr: first contact slot, npair, k: contacts/pair}
  dyngroups: tuple = static_field()
  dynslot: np.ndarray = static_field()       # (ncon,) bool: dynamic slot
  # flex-flex slots (self + internal collision): flex1 is the side-1 flex id
  # (-1 on geom slots). Self/internal contacts ignore margin and gap
  # (mj_collideElems with f1 == f2 / mj_collideFlexInternal,
  # engine_collision_driver.c:2524,2230). selfgroups: per-flex static
  # candidate element pairs owning `npair` budgeted slots, selected per step
  # by AABB-separation top-K then narrowphase (the fixed-shape analog of
  # mj_collideFlexSAP, engine_collision_driver.c:2315). intgroups: per-flex
  # within-element face-vertex slots (dim-3 anti-inversion,
  # mj_collideFlexInternal, engine_collision_driver.c:2230).
  flex1: np.ndarray = static_field()         # (ncon,)
  selfgroups: tuple = static_field()         # dicts {flex, adr, npair, e1, e2}
  intgroups: tuple = static_field()          # dicts {flex, adr, nslots}
  # predefined element-vertex internal pairs (flex_evpair,
  # mj_collideElemVert, engine_collision_driver.c:2620)
  evgroups: tuple = static_field()           # dicts {flex, adr, nslots, ev}
  # SDF narrowphase groups (mjc_SDF, engine_collision_sdf.c:1040): per pair
  # with an SDF side, `n` = opt.sdf_initpoints descent-start slots; kind is
  # an int GeomType for primitives or a plugin-name string, params are the
  # static plugin attributes, aabb the static local bounding boxes
  sdfgroups: tuple = static_field()          # dicts {g1, g2, adr, n,
                                             #  iterations, kind1, kind2,
                                             #  params1, params2, aabb1, aabb2}


@pytree_dataclass
class FlexMeta:
  """Static flex (deformable) topology, bridged from the compiled model.

  Counterpart of the flex arrays in mjmodel.h: vertices attach to bodies
  (flex_vertbodyid), elements are (dim+1)-vertex simplices, edges connect
  vertex pairs. Vertex/edge/element ids here are GLOBAL (already offset by
  the per-flex adr), so downstream code indexes flat arrays directly.
  """
  nflex: int = static_field()
  nvert: int = static_field()
  nedge: int = static_field()
  nelem: int = static_field()
  dim: np.ndarray = static_field()          # (nflex,)
  vertadr: np.ndarray = static_field()      # (nflex,)
  vertnum: np.ndarray = static_field()
  edgeadr: np.ndarray = static_field()
  edgenum: np.ndarray = static_field()
  elemadr: np.ndarray = static_field()
  elemnum: np.ndarray = static_field()
  vertbodyid: np.ndarray = static_field()   # (nvert,) global body id
  centered: np.ndarray = static_field()     # (nflex,) bool
  vert_iszero: np.ndarray = static_field()  # (nvert,) bool: zero local offset
  edge: np.ndarray = static_field()         # (nedge, 2) global vertex ids
  edge_flexid: np.ndarray = static_field()  # (nedge,)
  edge_rigid: np.ndarray = static_field()   # (nedge,) bool
  elem: np.ndarray = static_field()         # (nelem, 4) global vert ids, -1 pad
  elem_flexid: np.ndarray = static_field()  # (nelem,)
  rigid: np.ndarray = static_field()        # (nflex,) bool
  edgeequality: np.ndarray = static_field() # (nflex,)
  condim: np.ndarray = static_field()       # (nflex,)
  priority: np.ndarray = static_field()
  contype: np.ndarray = static_field()
  conaffinity: np.ndarray = static_field()
  # ----- element elasticity topology (mj_flexPassiveStretch/Bend,
  # engine_passive.c:459-651); all ids GLOBAL, -1 = absent
  elemedge: np.ndarray = static_field()     # (nelem, 6) global edge ids, 0 pad
  edgeflap: np.ndarray = static_field()     # (nedge, 2) global vert ids, -1
  has_stretch: np.ndarray = static_field()  # (nflex,) bool
  has_bending: np.ndarray = static_field()  # (nflex,) bool
  vert_simple: np.ndarray = static_field()  # (nvert,) bool: body_simple == 2
  vert_free: np.ndarray = static_field()    # (nvert,) bool: body_dofnum == 3
  vert_dofadr: np.ndarray = static_field()  # (nvert,) body_dofadr, -1 if none
  # per-element collision filter: dim-3 elements collide only in the
  # surface layers (elemlayer < activelayers, engine_collision_driver.c:351)
  elem_collidable: np.ndarray = static_field()  # (nelem,) bool
  elem_layer: np.ndarray = static_field()       # (nelem,) flex_elemlayer
  # interpolated (nodal) flexes, order-1 trilinear (flex_interp == 1):
  # vertices are interpolated from node bodies; per-vertex node ids and
  # trilinear weights are static (from the rest grid coords flex_vert0)
  interp: np.ndarray = static_field()       # (nflex,) 0 / 1
  nnode: int = static_field()
  nodeadr: np.ndarray = static_field()      # (nflex,)
  nodenum: np.ndarray = static_field()
  nodebodyid: np.ndarray = static_field()   # (nnode,)
  node_iszero: np.ndarray = static_field()  # (nnode,) bool
  cellnum: np.ndarray = static_field()      # (nflex, 3)
  vert0: np.ndarray = static_field()        # (nvert, 3) rest grid coords
  vert_node: np.ndarray = static_field()    # (nvert, 8) global node ids
  vert_nodew: np.ndarray = static_field()   # (nvert, 8) trilinear weights
  interp_stiffadr: np.ndarray = static_field()  # (nflex,) -1 when none
  interp_cell_active: Tuple = static_field()    # per-flex bool arrays
  # mjEQ_FLEXSTRAIN static tables (engine_core_constraint.c:806-980): one
  # entry per strain equality = one interpolated cell; each is a dict with
  # eq (equality id), flex, order, npe, gind (npe,) node indices into the
  # flex's node block, neig, eigvecs (neig, 3*npe) sqrt(λ)-scaled, and
  # diaga (avg node body invweight0). Empty tuple when no strain rows.
  strain: Tuple = static_field()


@pytree_dataclass
class EfcMeta:
  """Static constraint-row layout (fixed-shape efc arrays).

  Mirrors the row taxonomy of mj_makeConstraint
  (/root/reference/src/engine/engine_core_constraint.c) with compile-time
  sizes: equality, dof friction, limits, contacts.
  """
  nefc: int = static_field()
  ne: int = static_field()     # equality rows
  nf: int = static_field()     # friction rows
  nl: int = static_field()     # limit rows
  ncon_rows: int = static_field()  # contact rows
  # equality rows: eq index and row-within-constraint per row
  eq_id: np.ndarray = static_field()
  eq_row: np.ndarray = static_field()
  # friction rows: dof index per row (-1 if tendon), tendon idx
  friction_dof: np.ndarray = static_field()
  friction_ten: np.ndarray = static_field()
  # limit rows: jnt idx (-1 if tendon row), tendon idx, side (-1 lower /
  # +1 upper / 0 ball-norm)
  limit_jnt: np.ndarray = static_field()
  limit_ten: np.ndarray = static_field()
  limit_side: np.ndarray = static_field()
  # contact rows: which contact slot each row belongs to, and row-within-slot
  con_id: np.ndarray = static_field()
  con_row: np.ndarray = static_field()
  # per contact slot: address of its first row, number of rows
  con_efcadr: np.ndarray = static_field()
  con_nrow: np.ndarray = static_field()


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


@pytree_dataclass
class Model:
  """Immutable model: sizes + topology (static) and parameters (traced).

  Counterpart of mjModel (mjmodel.h:242). Numeric leaves may carry a leading
  batch dimension under vmap for domain randomization.
  """
  # ----- sizes (static)
  nq: int = static_field()
  nv: int = static_field()
  nu: int = static_field()
  na: int = static_field()
  nbody: int = static_field()
  njnt: int = static_field()
  ngeom: int = static_field()
  nsite: int = static_field()
  neq: int = static_field()
  ntendon: int = static_field()
  nwrap: int = static_field()
  nsensor: int = static_field()
  nsensordata: int = static_field()
  nmocap: int = static_field()
  nkey: int = static_field()
  ncam: int = static_field()
  nlight: int = static_field()
  nhfield: int = static_field()
  # static algorithm-selection flags derived at put_model time
  has_dof_damping: bool = static_field()
  has_fluid: bool = static_field()
  has_tendon_armature: bool = static_field()
  has_actgravcomp: bool = static_field()
  has_flex: bool = static_field()

  opt: Option = field()

  # model statistics (mjStatistic): solver scaling reference
  stat_meaninertia: jax.Array = field()

  # ----- derived static metadata
  tree: TreeTopology = field()
  con: ContactMeta = field()
  efc: EfcMeta = field()

  # ----- qpos defaults
  qpos0: jax.Array = field()
  qpos_spring: jax.Array = field()

  # ----- bodies
  body_parentid: np.ndarray = static_field()
  body_rootid: np.ndarray = static_field()
  body_weldid: np.ndarray = static_field()
  body_jntnum: np.ndarray = static_field()
  body_jntadr: np.ndarray = static_field()
  body_dofnum: np.ndarray = static_field()
  body_dofadr: np.ndarray = static_field()
  body_geomnum: np.ndarray = static_field()
  body_geomadr: np.ndarray = static_field()
  body_mocapid: np.ndarray = static_field()
  body_pos: jax.Array = field()
  body_quat: jax.Array = field()
  body_ipos: jax.Array = field()
  body_iquat: jax.Array = field()
  body_mass: jax.Array = field()
  body_subtreemass: jax.Array = field()
  body_inertia: jax.Array = field()
  body_invweight0: jax.Array = field()
  body_gravcomp: jax.Array = field()

  # ----- joints
  jnt_type: np.ndarray = static_field()
  jnt_qposadr: np.ndarray = static_field()
  jnt_dofadr: np.ndarray = static_field()
  jnt_bodyid: np.ndarray = static_field()
  jnt_limited: np.ndarray = static_field()
  jnt_actfrclimited: np.ndarray = static_field()
  jnt_actgravcomp: np.ndarray = static_field()
  jnt_solref: jax.Array = field()
  jnt_solimp: jax.Array = field()
  jnt_pos: jax.Array = field()
  jnt_axis: jax.Array = field()
  jnt_stiffness: jax.Array = field()
  jnt_range: jax.Array = field()
  jnt_actfrcrange: jax.Array = field()
  jnt_margin: jax.Array = field()

  # ----- dofs
  dof_bodyid: np.ndarray = static_field()
  dof_jntid: np.ndarray = static_field()
  dof_parentid: np.ndarray = static_field()
  dof_armature: jax.Array = field()
  dof_damping: jax.Array = field()
  dof_invweight0: jax.Array = field()
  dof_frictionloss: jax.Array = field()
  dof_solref: jax.Array = field()
  dof_solimp: jax.Array = field()

  # ----- geoms
  geom_type: np.ndarray = static_field()
  geom_contype: np.ndarray = static_field()
  geom_conaffinity: np.ndarray = static_field()
  geom_condim: np.ndarray = static_field()
  geom_bodyid: np.ndarray = static_field()
  geom_dataid: np.ndarray = static_field()
  geom_priority: np.ndarray = static_field()
  geom_group: np.ndarray = static_field()
  # ----- kinematic-tree sleep metadata (mjmodel.h tree_* arrays;
  # engine_sleep.c). ntree == 0 disables the machinery entirely.
  ntree: int = static_field()
  body_treeid: np.ndarray = static_field()       # (nbody,) -1 for static
  dof_treeid: np.ndarray = static_field()        # (nv,)
  tree_sleep_policy: np.ndarray = static_field() # (ntree,) mjtSleepPolicy
  tree_dof_mask: np.ndarray = static_field()     # (ntree, nv) bool
  tree_body_mask: np.ndarray = static_field()    # (ntree, nbody) bool
  tendon_treeid: np.ndarray = static_field()     # (ntendon, 2)
  tendon_treenum: np.ndarray = static_field()    # (ntendon,)
  dof_length: jax.Array = field()                # (nv,) tolerance weights
  geom_rgba: jax.Array = field()             # (ngeom, 4) render color
  geom_solmix: jax.Array = field()
  geom_solref: jax.Array = field()
  geom_solimp: jax.Array = field()
  geom_size: jax.Array = field()
  geom_rbound: jax.Array = field()
  geom_pos: jax.Array = field()
  geom_quat: jax.Array = field()
  geom_friction: jax.Array = field()
  geom_margin: jax.Array = field()
  geom_gap: jax.Array = field()
  geom_fluid: jax.Array = field()            # (ngeom, 12) ellipsoid-model
  geom_has_fluid: np.ndarray = static_field()  # static gate per geom

  # ----- sites
  site_bodyid: np.ndarray = static_field()
  site_type: np.ndarray = static_field()
  site_size: jax.Array = field()
  site_pos: jax.Array = field()
  site_quat: jax.Array = field()

  # ----- explicit contact pairs
  pair_dim: np.ndarray = static_field()
  pair_geom1: np.ndarray = static_field()
  pair_geom2: np.ndarray = static_field()
  pair_solref: jax.Array = field()
  pair_solreffriction: jax.Array = field()
  pair_solimp: jax.Array = field()
  pair_margin: jax.Array = field()
  pair_gap: jax.Array = field()
  pair_friction: jax.Array = field()

  # ----- equality constraints
  eq_type: np.ndarray = static_field()
  eq_obj1id: np.ndarray = static_field()
  eq_obj2id: np.ndarray = static_field()
  eq_objtype: np.ndarray = static_field()
  eq_active0: np.ndarray = static_field()
  eq_solref: jax.Array = field()
  eq_solimp: jax.Array = field()
  eq_data: jax.Array = field()

  # ----- tendons
  tendon_adr: np.ndarray = static_field()
  tendon_num: np.ndarray = static_field()
  tendon_limited: np.ndarray = static_field()
  tendon_solref_lim: jax.Array = field()
  tendon_solimp_lim: jax.Array = field()
  tendon_solref_fri: jax.Array = field()
  tendon_solimp_fri: jax.Array = field()
  tendon_range: jax.Array = field()
  tendon_margin: jax.Array = field()
  tendon_armature: jax.Array = field()
  tendon_stiffness: jax.Array = field()
  tendon_damping: jax.Array = field()
  tendon_frictionloss: jax.Array = field()
  tendon_lengthspring: jax.Array = field()
  tendon_length0: jax.Array = field()
  tendon_invweight0: jax.Array = field()
  wrap_type: np.ndarray = static_field()
  wrap_objid: np.ndarray = static_field()
  wrap_sideid: np.ndarray = static_field()   # static int copy of wrap_prm
  wrap_prm: jax.Array = field()

  # ----- actuators
  # Multi-input/output block layout (reference v3.11 nactuator/nu/nout split,
  # mjmodel.h:787-791): here `nu` stays the NUMBER OF ACTUATORS (the
  # reference's nactuator); nctrl/nout are the total ctrl / force-output dims
  # (== nu when the model has no SO3 actuators, so all legacy per-actuator
  # indexing stays valid). SO3 geodesic servos own 3-4 ctrl inputs and 3
  # force outputs (mjTRN_SO3, engine_core_smooth.c:1482).
  nctrl: int = static_field()
  nout: int = static_field()
  actuator_ctrladr: np.ndarray = static_field()
  actuator_ctrlnum: np.ndarray = static_field()
  actuator_outadr: np.ndarray = static_field()
  actuator_outnum: np.ndarray = static_field()
  # input signature (mjtCtrlChart, mjtype.h:276): 0 default, 1 expmap (3
  # controls), 2 quat (4 controls) — scoped by gaintype
  actuator_ctrlspec: np.ndarray = static_field()
  actuator_trntype: np.ndarray = static_field()
  actuator_dyntype: np.ndarray = static_field()
  actuator_gaintype: np.ndarray = static_field()
  actuator_biastype: np.ndarray = static_field()
  actuator_trnid: np.ndarray = static_field()
  actuator_actadr: np.ndarray = static_field()
  actuator_actnum: np.ndarray = static_field()
  actuator_ctrllimited: np.ndarray = static_field()
  actuator_forcelimited: np.ndarray = static_field()
  actuator_actlimited: np.ndarray = static_field()
  actuator_actearly: np.ndarray = static_field()
  actuator_group: np.ndarray = static_field()
  # DC-motor / PID activation slot layout, computed at put_model from the
  # (numpy) prm values (mj_dcmotorSlots, engine_util_misc.c:1202): columns
  # [slew, integral, temperature, bristle, current, num_slots, input_mode];
  # absent slot = -1. PID uses the slew/integral columns only.
  actuator_slots: np.ndarray = static_field()
  # rotational servo wrap period 2π·|gear| (wrapPeriod, engine_forward.c:295),
  # 0 for non-wrap-eligible actuators; frozen at put_model time
  actuator_wrapprd: np.ndarray = static_field()
  # ctrl history/delay buffers (mjmodel.h:802-804): [nsample, interp] per
  # actuator, address into Data.history, and delay in seconds. Static model
  # metadata — buffer layout and the delayed-vs-direct branch are baked into
  # the trace (delays are not domain-randomizable leaves).
  actuator_history: np.ndarray = static_field()     # (nu, 2) int
  actuator_historyadr: np.ndarray = static_field()  # (nu,) int
  actuator_delay: np.ndarray = static_field()       # (nu,) float
  actuator_dynprm: jax.Array = field()
  actuator_gainprm: jax.Array = field()
  actuator_biasprm: jax.Array = field()
  actuator_ctrlrange: jax.Array = field()
  actuator_forcerange: jax.Array = field()
  actuator_actrange: jax.Array = field()
  actuator_gear: jax.Array = field()
  actuator_cranklength: jax.Array = field()
  actuator_acc0: jax.Array = field()
  actuator_lengthrange: jax.Array = field()

  # ----- meshes (vertex data traced; topology static)
  mesh_normaladr: np.ndarray = static_field()
  mesh_normalnum: np.ndarray = static_field()
  mesh_vertadr: np.ndarray = static_field()
  mesh_vertnum: np.ndarray = static_field()
  mesh_faceadr: np.ndarray = static_field()
  mesh_facenum: np.ndarray = static_field()
  mesh_face: np.ndarray = static_field()     # (nmeshface, 3) vertex ids
  mesh_vert: jax.Array = field()
  mesh_normal: jax.Array = field()           # (nmeshnormal, 3)             # (nmeshvert, 3)
  # per-mesh convex-hull vertex ids (GLOBAL rows of mesh_vert), computed at
  # put_model and decimated to MJTPU_MAX_HULL_VERT by farthest-point
  # sampling — the compile-time hull/maxhullvert analog of
  # mjCMesh::MakeGraph (user_mesh.cc). Convex support functions gather these
  # static indices from the traced vertex table, so MPR cost is O(nhull)
  # instead of O(nvert) while domain randomization still flows through.
  mesh_hull_idx: tuple = static_field()      # tuple of (nh_i,) int32

  # ----- extension callbacks (mjcb_* analog, resolved from the plugin
  # registry at put_model time — see mujoco_tpu/plugin.py):
  # (act_dyn, act_gain, act_bias, sensor, passive), entries None when unset
  user_cb: tuple = static_field()

  # ----- visualization constants for the mjv-lite scene export
  # (mjVisual/mjStatistic subset, mujoco_tpu/vis.py): meansize, meanmass,
  # contactwidth, contactheight, forcewidth, map_force,
  # rgba_contactpoint/contactforce
  vis_meta: dict = static_field()

  # ----- height fields (geometry static; elevation data traced so terrain
  # is domain-randomizable per env)
  hfield_adr: np.ndarray = static_field()
  hfield_nrow: np.ndarray = static_field()
  hfield_ncol: np.ndarray = static_field()
  hfield_size_np: np.ndarray = static_field()
  hfield_data: jax.Array = field()

  # ----- cameras and lights
  cam_bodyid: np.ndarray = static_field()
  cam_targetbodyid: np.ndarray = static_field()
  cam_mode: np.ndarray = static_field()
  cam_pos: jax.Array = field()
  cam_quat: jax.Array = field()
  cam_pos0: jax.Array = field()
  cam_poscom0: jax.Array = field()
  cam_mat0: jax.Array = field()
  cam_fovy: jax.Array = field()
  cam_resolution: np.ndarray = static_field()
  cam_projection: np.ndarray = static_field()  # (ncam,) mjtProjection
  cam_intrinsic: jax.Array = field()
  cam_sensorsize: jax.Array = field()
  light_bodyid: np.ndarray = static_field()
  light_targetbodyid: np.ndarray = static_field()
  light_mode: np.ndarray = static_field()
  light_pos: jax.Array = field()
  light_dir: jax.Array = field()
  light_pos0: jax.Array = field()
  light_poscom0: jax.Array = field()
  light_dir0: jax.Array = field()
  # light photometry (mjmodel.h light_* render fields; consumed by
  # ops/render.py's Blinn-Phong shading the way the classic GL renderer
  # consumes them, render_gl3.c)
  light_type: np.ndarray = static_field()        # (nlight,) mjtLightType
  light_active: np.ndarray = static_field()      # (nlight,) bool
  light_castshadow: np.ndarray = static_field()  # (nlight,) bool
  light_ambient: jax.Array = field()             # (nlight, 3)
  light_diffuse: jax.Array = field()             # (nlight, 3)
  light_specular: jax.Array = field()            # (nlight, 3)
  light_attenuation: jax.Array = field()         # (nlight, 3) K0 K1 K2
  light_cutoff: jax.Array = field()              # (nlight,) spot, degrees
  light_exponent: jax.Array = field()            # (nlight,) spot

  # ----- materials and textures (mjmodel.h mat_*/tex_*; resolution rule
  # per setMaterial, engine_vis_visualize.c:225-247). tex_data is traced so
  # textures are domain-randomizable; layout is the reference's flat
  # row-major RGB byte stream, stored normalized to [0, 1].
  nmat: int = static_field()
  ntex: int = static_field()
  geom_matid: np.ndarray = static_field()        # (ngeom,) -1 if none
  mat_texid: np.ndarray = static_field()         # (nmat,) RGB-role texture
  mat_texuniform: np.ndarray = static_field()    # (nmat,) bool
  mat_texrepeat: jax.Array = field()             # (nmat, 2)
  mat_rgba: jax.Array = field()                  # (nmat, 4)
  mat_emission: jax.Array = field()              # (nmat,)
  mat_specular: jax.Array = field()              # (nmat,)
  mat_shininess: jax.Array = field()             # (nmat,)
  mat_reflectance: jax.Array = field()           # (nmat,)
  tex_type: np.ndarray = static_field()          # (ntex,) mjtTexture
  tex_adr: np.ndarray = static_field()           # (ntex,) into tex_data
  tex_width: np.ndarray = static_field()         # (ntex,)
  tex_height: np.ndarray = static_field()        # (ntex,)
  tex_data: jax.Array = field()                  # (ntexdata,) RGB in [0,1]

  # ----- skins (mjmodel.h skin_*; evolved by ops/skin.skin_update, the
  # mjv_updateActiveSkin analog, engine_vis_visualize.c:3403). Topology is
  # static; bind poses, rest vertices, and weights are traced so skinned
  # characters are domain-randomizable.
  nskin: int = static_field()
  skin_matid: np.ndarray = static_field()        # (nskin,)
  skin_group: np.ndarray = static_field()        # (nskin,)
  skin_rgba: jax.Array = field()                 # (nskin, 4)
  skin_inflate: jax.Array = field()              # (nskin,)
  skin_vertadr: np.ndarray = static_field()      # (nskin,)
  skin_vertnum: np.ndarray = static_field()      # (nskin,)
  skin_faceadr: np.ndarray = static_field()      # (nskin,)
  skin_facenum: np.ndarray = static_field()      # (nskin,)
  skin_boneadr: np.ndarray = static_field()      # (nskin,)
  skin_bonenum: np.ndarray = static_field()      # (nskin,)
  skin_vert: jax.Array = field()                 # (nskinvert, 3) rest pose
  skin_face: np.ndarray = static_field()         # (nskinface, 3)
  skin_bonevertadr: np.ndarray = static_field()  # (nskinbone,)
  skin_bonevertnum: np.ndarray = static_field()  # (nskinbone,)
  skin_bonebodyid: np.ndarray = static_field()   # (nskinbone,)
  skin_bonebindpos: jax.Array = field()          # (nskinbone, 3)
  skin_bonebindquat: jax.Array = field()         # (nskinbone, 4)
  skin_bonevertid: np.ndarray = static_field()   # (nskinbonevert,)
  skin_bonevertweight: jax.Array = field()       # (nskinbonevert,)

  # ----- keyframes
  key_time: jax.Array = field()
  key_qpos: jax.Array = field()
  key_qvel: jax.Array = field()
  key_act: jax.Array = field()
  key_ctrl: jax.Array = field()
  key_mpos: jax.Array = field()
  key_mquat: jax.Array = field()

  # ----- names (static lookup tables, mj_name2id/mj_id2name analog)
  names: dict = static_field()

  # ----- sensors
  sensor_type: np.ndarray = static_field()
  sensor_datatype: np.ndarray = static_field()
  sensor_needstage: np.ndarray = static_field()
  sensor_objtype: np.ndarray = static_field()
  sensor_objid: np.ndarray = static_field()
  sensor_reftype: np.ndarray = static_field()
  sensor_refid: np.ndarray = static_field()
  sensor_dim: np.ndarray = static_field()
  sensor_adr: np.ndarray = static_field()
  # contact-sensor int parameters [dataspec, reduce, _] (mjNSENS columns,
  # mjmodel.h sensor_intprm)
  sensor_intprm: np.ndarray = static_field()        # (nsensor, 3) int
  # sensor history/delay buffers (mjmodel.h:833-835) — see actuator_history
  sensor_history: np.ndarray = static_field()       # (nsensor, 2) int
  sensor_historyadr: np.ndarray = static_field()    # (nsensor,) int
  sensor_delay: np.ndarray = static_field()         # (nsensor,) float
  sensor_interval: np.ndarray = static_field()      # (nsensor, 2) float
  nhistory: int = static_field()
  sensor_cutoff: jax.Array = field()

  # ----- flex (deformables); topology in flx, numeric parameters traced
  flx: FlexMeta = static_field()
  flex_vert: jax.Array = field()             # (nvert, 3) local offsets
  flex_node: jax.Array = field()             # (nnode, 3) local offsets
  flex_rgba: jax.Array = field()             # (nflex, 4) render color
  flex_node0: jax.Array = field()            # (nnode, 3) rest node pos
  # raw per-cell FEM stiffness for interpolated flexes (the reference's
  # flex_stiffness stores -K_physical, ndof_elem^2 per cell); empty when
  # no interp flex has elasticity
  flex_stiffness_interp: jax.Array = field() # (flat,)
  flex_radius: jax.Array = field()           # (nflex,)
  flexedge_length0: jax.Array = field()      # (nedge,)
  flexedge_invweight0: jax.Array = field()   # (nedge,)
  flex_edgestiffness: jax.Array = field()    # (nflex,)
  flex_edgedamping: jax.Array = field()      # (nflex,)
  flex_damping: jax.Array = field()          # (nflex,)
  flex_friction: jax.Array = field()         # (nflex, 3)
  flex_solref: jax.Array = field()           # (nflex, 2)
  flex_solimp: jax.Array = field()           # (nflex, 5)
  flex_margin: jax.Array = field()           # (nflex,)
  flex_gap: jax.Array = field()              # (nflex,)
  flex_solmix: jax.Array = field()           # (nflex,)
  # element elasticity coefficients (zero rows where a flex has none):
  # per-element upper-triangular edge metric (21 = triu of 6x6; dim-2 uses the
  # leading triu of 3x3) and per-edge thin-plate bending operator
  # (16 = 4x4 Hessian + 1 curved-reference coefficient)
  flex_stiffness: jax.Array = field()        # (nelem, 21)
  flex_bending: jax.Array = field()          # (nedge, 17)

  def disabled(self, bit: DisableBit) -> bool:
    return bool(self.opt.disableflags & bit)

  def enabled(self, bit: EnableBit) -> bool:
    return bool(self.opt.enableflags & bit)


# ---------------------------------------------------------------------------
# Contact + Data
# ---------------------------------------------------------------------------


@pytree_dataclass
class Contact:
  """Fixed-shape contact arrays; slot layout is in Model.con.

  Counterpart of mjContact (mjdata.h:37). ``dist > includemargin`` marks a
  slot inactive. frame[..., 0, :] is the contact normal (c1→c2), rows 1-2 the
  tangents, matching the reference's frame convention.
  """
  dist: jax.Array          # (ncon,)
  pos: jax.Array           # (ncon, 3)
  frame: jax.Array         # (ncon, 3, 3)
  includemargin: jax.Array # (ncon,)
  friction: jax.Array      # (ncon, 5)
  solref: jax.Array        # (ncon, 2)
  solreffriction: jax.Array  # (ncon, 2)
  solimp: jax.Array        # (ncon, 5)
  mu: jax.Array            # (ncon,) regularized-cone friction (set by
                           # make_constraint, mj_makeImpedance semantics)
  # flex contacts: global vertex ids of the contacting element (or a single
  # vertex for plane-vertex contacts), -1 padded; selected dynamically by the
  # top-K budget, hence traced (mjContact.flex/elem/vert analog, mjdata.h:37)
  flexvert: jax.Array      # (ncon, 4) int32
  # flex-flex contacts (self/internal collision): vertex ids of the FIRST
  # side's element (mjContact.elem[0]/vert[0] analog); -1 on all other slots
  flexvert1: jax.Array     # (ncon, 4) int32
  # per-slot geom ids (mjContact.geom analog): equal to the static meta ids
  # except on dynamic pair-group slots, where the contacting pair is chosen
  # per step by the broadphase cull
  geomids: jax.Array       # (ncon, 2) int32



@pytree_dataclass
class Data:
  """State + computed quantities for one env; vmap for batches.

  Counterpart of mjData (mjdata.h:99); the arena/stack allocator disappears —
  XLA owns buffers. Every stage of forward() consumes and produces a Data.
  """
  # state (mjSTATE_INTEGRATION analog, mjtype.h:501-526)
  time: jax.Array
  qpos: jax.Array
  qvel: jax.Array
  act: jax.Array
  ctrl: jax.Array
  qfrc_applied: jax.Array
  xfrc_applied: jax.Array      # (nbody, 6)
  eq_active: jax.Array         # (neq,) bool
  mocap_pos: jax.Array         # (nmocap, 3)
  mocap_quat: jax.Array        # (nmocap, 4)
  qacc_warmstart: jax.Array

  # position-stage products
  xpos: jax.Array              # (nbody, 3)
  xquat: jax.Array             # (nbody, 4)
  xmat: jax.Array              # (nbody, 3, 3)
  xipos: jax.Array             # (nbody, 3)
  ximat: jax.Array             # (nbody, 3, 3)
  xanchor: jax.Array           # (njnt, 3)
  xaxis: jax.Array             # (njnt, 3)
  geom_xpos: jax.Array         # (ngeom, 3)
  geom_xmat: jax.Array         # (ngeom, 3, 3)
  site_xpos: jax.Array         # (nsite, 3)
  site_xmat: jax.Array         # (nsite, 3, 3)
  cam_xpos: jax.Array          # (ncam, 3)
  cam_xmat: jax.Array          # (ncam, 3, 3)
  light_xpos: jax.Array        # (nlight, 3)
  light_xdir: jax.Array        # (nlight, 3)
  subtree_com: jax.Array       # (nbody, 3)
  cinert: jax.Array            # (nbody, 6, 6) spatial inertia, c-frame
  cdof: jax.Array              # (nv, 6) motion axes, c-frame
  crb: jax.Array               # (nbody, 6, 6) composite rigid body inertia
  qM: jax.Array                # (nv, nv) dense joint-space inertia
  qLD: jax.Array               # (nv, nv) Cholesky factor of qM
  qLDiagInv: jax.Array         # (nv,) unused in dense mode; kept for parity
  ten_length: jax.Array        # (ntendon,)
  ten_J: jax.Array             # (ntendon, nv)
  flexvert_xpos: jax.Array     # (nflexvert, 3)
  flexedge_length: jax.Array   # (nflexedge,)
  flexedge_velocity: jax.Array # (nflexedge,)
  flexedge_J: jax.Array        # (nflexedge, nv)
  actuator_length: jax.Array   # (nu,)
  actuator_moment: jax.Array   # (nu, nv)
  contact: Contact = field()

  # velocity-stage products
  cvel: jax.Array              # (nbody, 6)
  cdof_dot: jax.Array          # (nv, 6)
  qfrc_bias: jax.Array         # (nv,)
  ten_velocity: jax.Array      # (ntendon,)
  actuator_velocity: jax.Array # (nu,)
  qfrc_spring: jax.Array
  qfrc_damper: jax.Array
  qfrc_gravcomp: jax.Array
  qfrc_fluid: jax.Array
  qfrc_passive: jax.Array

  # actuation-stage products
  act_dot: jax.Array
  actuator_force: jax.Array    # (nu,)
  qfrc_actuator: jax.Array

  # acceleration-stage products
  qfrc_smooth: jax.Array
  qacc_smooth: jax.Array

  # constraint-stage products (fixed-shape rows; layout in Model.efc)
  efc_J: jax.Array             # (nefc, nv)
  efc_pos: jax.Array           # (nefc,)
  efc_margin: jax.Array
  efc_D: jax.Array             # (nefc,) inverse regularizer
  efc_R: jax.Array             # (nefc,)
  efc_aref: jax.Array
  efc_frictionloss: jax.Array
  efc_KBIP: jax.Array          # (nefc, 4) stiffness/damping/impedance/imp'
  efc_active: jax.Array        # (nefc,) bool: row exists this step
  efc_force: jax.Array
  qfrc_constraint: jax.Array
  qacc: jax.Array
  qfrc_inverse: jax.Array

  # post-constraint body dynamics (mj_rnePostConstraint / mj_subtreeVel)
  cacc: jax.Array              # (nbody, 6) body accelerations, c-frame
  cfrc_int: jax.Array          # (nbody, 6) interaction force with parent
  cfrc_ext: jax.Array          # (nbody, 6) external force on body
  subtree_linvel: jax.Array    # (nbody, 3)
  subtree_angmom: jax.Array    # (nbody, 3)

  # sensors & diagnostics
  sensordata: jax.Array
  energy: jax.Array            # (2,) potential, kinetic
  # per-iteration solver diagnostics (mjSolverStat analog, mjdata.h:86-94):
  # rows [improvement, cost] for the first 32 iterations; filled by the
  # bounded-scan solver path (5 ≤ iterations ≤ 32), zeros otherwise
  solver_stat: jax.Array       # (32, 2)
  solver_niter: jax.Array      # iterations taken by the constraint solver
  # per-step overflow counters (mjWARN_CONTACTFULL analog, mjtype.h:550-560;
  # reference accumulates until reset, we report the CURRENT step —
  # documented deviation). Index 0: penetrating contact candidates dropped
  # by a full top-K slot budget (flex/self/internal groups); index 1:
  # overlapping broadphase pairs dropped by a full dynamic pair budget.
  warning: jax.Array           # (2,) int32
  # per-tree sleep state (mjData.tree_asleep, engine_sleep.c): < 0 awake
  # countdown (-(1+mjMINAWAKE) fully awake, -1 ready to sleep); >= 0 asleep,
  # holding the island's canonical label (smallest tree id in the island;
  # the reference stores cycle pointers instead -- documented deviation).
  # Shape (ntree,); (0,) when the model has no dynamic trees.
  tree_asleep: jax.Array
  # ctrl/sensor history ring buffers, reference layout per buffer:
  # [user, cursor, times(n), values(n*dim)] (mjData.history, mjdata.h;
  # mju_historyInit, engine_util_misc.c:1403). Shape (nhistory,); (0,) when
  # the model has no history buffers.
  history: jax.Array
