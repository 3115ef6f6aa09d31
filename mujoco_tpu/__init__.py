"""mujoco_tpu: a TPU-native rigid-body physics engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MuJoCo
(github.com/google-deepmind/mujoco): generalized-coordinate smooth dynamics,
convex contact dynamics with Newton/CG/PGS solvers, sensors, tendons,
actuators, and batched/sharded TPU execution.

Public API (mirrors the reference's naming where a counterpart exists):

  put_model(mujoco.MjModel) -> Model     # model bridge (mjx.put_model analog)
  make_data(Model) -> Data               # mj_makeData
  step / forward / inverse               # mj_step / mj_forward / mj_inverse
  get_state / set_state / StateBit       # mj_getState / mj_setState
  get_data / get_data_into               # viewer/render bridge
  transition                             # mjd_transitionFD analog (exact AD)
  ray                                    # mj_ray
"""

from mujoco_tpu.models.io import (get_data, get_data_into, make_data,
                                  put_model)
from mujoco_tpu.models.types import (ConeType, Contact, Data, DisableBit,
                                     DynType, EnableBit, EqType, GainType,
                                     GeomType, Integrator, JointType, Model,
                                     ObjType, Option, SensorType, SolverType,
                                     TrnType)
from mujoco_tpu.ops.forward import (euler, forward, fwd_acceleration,
                                    fwd_actuation, fwd_constraint,
                                    fwd_position, fwd_velocity, rungekutta4,
                                    step)
from mujoco_tpu.ops.inverse import compare_fwd_inv, inverse
from mujoco_tpu.ops.derivative_fd import (inverse_derivatives, transition,
                                          transition_fd)
from mujoco_tpu.ops.ray import ray, ray_geom
from mujoco_tpu import plugin
from mujoco_tpu import vis
from mujoco_tpu import sysid
from mujoco_tpu import usd_export
from mujoco_tpu.ops.skin import skin_update
from mujoco_tpu.usd_export import export_usd
from mujoco_tpu.ops.render import render, render_scene
from mujoco_tpu.ops.sleep import init_sleep
from mujoco_tpu.ops.history import (init_ctrl_history, init_sensor_history,
                                    read_ctrl, read_sensor)
from mujoco_tpu.ops.sensor import (contact_force, energy_pos, energy_vel,
                                   object_acceleration, object_velocity)
from mujoco_tpu.ops.state import (StateBit, get_state, id2name, name2id,
                                  reset_data, reset_data_keyframe, set_state,
                                  state_size)
from mujoco_tpu.ops import smooth, support
from mujoco_tpu.parallel.rollout import (batched_step, check_reset,
                                         make_batch, make_mesh,
                                         randomize_model, rollout,
                                         sharded_step, step_randomized)

__version__ = "0.1.0"
