"""System identification: recover joint damping from a trajectory by
differentiating through the physics.

Run:  python examples/sysid_fit.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import mujoco

import mujoco_tpu as mt
from mujoco_tpu import sysid

XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j" type="hinge" axis="0 1 0" damping="0.27"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.4 0 0"/>
    </body>
  </worldbody>
  <actuator><motor joint="j" gear="2"/></actuator>
</mujoco>"""

mjm = mujoco.MjModel.from_xml_string(XML)
m = mt.put_model(mjm)
d0 = mt.make_data(m)
ctrls = 0.4 * np.sin(0.1 * np.arange(150))[:, None]
observed = sysid.simulate(m, d0, jnp.asarray(ctrls))   # "measurement"

spec = [("dof_damping", None)]
m_wrong = sysid.apply_params(m, spec, jnp.array([1.0]))
res = sysid.fit(m_wrong, d0, ctrls, observed, spec)
print(f"true damping 0.27, recovered {float(res.x[0]):.6f} "
      f"(cost {float(res.cost):.2e})")
