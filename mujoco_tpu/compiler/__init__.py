"""Native MJCF model compiler (the reference's src/user + src/xml layer,
re-built for the TPU engine).

Counterpart of mj_loadXML → mjCModel::Compile
(/root/reference/src/xml/xml_api.cc:40,
/root/reference/src/user/user_model.cc:4862): parses MJCF, resolves default
classes, computes inertias and addressing, and derives the qpos0-dependent
constants (mj_setConst, engine_setconst.c) using THIS engine's own forward
kinematics — no dependency on the reference's compiler.

Public API:
  load_xml(xml)  -> CompiledModel  (attribute-compatible with the subset of
                                    mujoco.MjModel that put_model consumes)
  compile_spec(spec) -> CompiledModel

Supported MJCF subset (differentially tested against the reference compiler
in tests/test_compiler.py): option/flags, nested default classes, bodies
with all four joint types (pos/quat/euler/axisangle/xyaxes/zaxis/fromto
frames), geoms (plane, sphere, capsule, cylinder, ellipsoid, box, inline
meshes), explicit or geom-derived inertia, sites, cameras, lights,
motor/position/velocity/general/muscle actuators, fixed and site-path
spatial tendons, connect/weld/joint/tendon equalities, contact pairs and
excludes, common sensors, and keyframes.
"""

from mujoco_tpu.compiler.core import (CompiledModel, compile_spec, load_xml, load_xml_path)
from mujoco_tpu.compiler.spec_api import MjSpec, MjsElement
from mujoco_tpu.compiler.urdf import load_urdf, load_urdf_path
from mujoco_tpu.compiler.serialize import load_model, save_model
from mujoco_tpu.compiler.mjz import load_cached, load_mjz

__all__ = ["CompiledModel", "compile_spec", "load_xml", "load_xml_path", "MjSpec", "MjsElement", "load_urdf", "load_urdf_path", "save_model", "load_model", "load_mjz", "load_cached"]
