"""Test model zoo: original MJCF strings exercising each capability tier.

These are authored for this project (not taken from the reference's model/
directory); they cover the same capability ladder as BASELINE.json's configs:
contact-free chains, ball/free joints, tendons+actuators, contact-rich
humanoid-class scenes.
"""

PENDULUM = """
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1.2">
      <joint name="swing" type="hinge" axis="0 1 0" damping="0.08"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0 0 -0.55" density="900"/>
      <body pos="0 0 -0.55">
        <joint name="elbow" type="hinge" axis="0 1 0" stiffness="1.5"
               springref="0.3" damping="0.02"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.02 0 -0.4"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

CARTPOLE = """
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <body pos="0 0 0.6">
      <joint name="slider" type="slide" axis="1 0 0" damping="0.1"/>
      <geom type="box" size="0.12 0.06 0.04" mass="0.9" contype="0"
            conaffinity="0"/>
      <body pos="0.0 0 0.04">
        <joint name="pole" type="hinge" axis="0 1 0"/>
        <geom type="capsule" size="0.022" fromto="0 0 0 0 0 0.62" mass="0.13"
              contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="slider" gear="90" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>
</mujoco>
"""

# ball + free joints, offset anchors, multi-joint bodies — FK/CoM stress test
CHAIN_3D = """
<mujoco>
  <option timestep="0.003"/>
  <worldbody>
    <body pos="0.1 -0.05 1.4" quat="0.96 0.1 0.2 0.12">
      <freejoint/>
      <geom type="box" size="0.08 0.05 0.03" density="700" contype="0"
            conaffinity="0"/>
      <body pos="0.09 0.01 -0.02" quat="0.9 0.17 0 0.4">
        <joint type="ball" pos="0.01 0.005 0.02" damping="0.01"/>
        <geom type="capsule" size="0.025" fromto="0 0 0 0.22 0.05 -0.18"
              contype="0" conaffinity="0"/>
        <body pos="0.22 0.05 -0.18">
          <joint type="hinge" axis="0.3 0.9 0.4" pos="0.01 -0.01 0.0"/>
          <joint type="slide" axis="1 0.2 0" damping="0.03"/>
          <geom type="sphere" size="0.045" pos="0.1 0 0" contype="0"
                conaffinity="0"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

# sphere/capsule/plane contacts, limits, friction — mini contact scene
BALLS = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="4 4 0.1" friction="1 0.01 0.002"/>
    <body pos="0 0 0.35">
      <freejoint/>
      <geom type="sphere" size="0.1" friction="0.8 0.008 0.001"/>
    </body>
    <body pos="0.15 0.02 0.8">
      <freejoint/>
      <geom type="capsule" size="0.06" fromto="-0.12 0 0 0.12 0 0"/>
    </body>
  </worldbody>
</mujoco>
"""


def load(xml: str):
  import mujoco
  return mujoco.MjModel.from_xml_string(xml)
