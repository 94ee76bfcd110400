"""Hand-written MJCF test models exercising each joint/geom/actuator type."""

# A serial chain with hinge + slide joints, sites, motors — no contacts.
CHAIN = """
<mujoco model="chain">
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="cart" pos="0 0 1">
      <joint name="slide0" type="slide" axis="1 0 0" damping="0.1"/>
      <geom name="cart_geom" type="box" size="0.1 0.1 0.05" mass="1.0"
            contype="0" conaffinity="0"/>
      <body name="pole" pos="0 0 0.05">
        <joint name="hinge0" type="hinge" axis="0 1 0" damping="0.01"/>
        <geom name="pole_geom" type="capsule" fromto="0 0 0 0 0 0.6"
              size="0.02" mass="0.3" contype="0" conaffinity="0"/>
        <site name="tip" pos="0 0 0.6"/>
        <body name="pole2" pos="0 0 0.6" euler="0 20 0">
          <joint name="hinge1" type="hinge" axis="1 0 0" damping="0.01"
                 stiffness="2.0" springref="0.3"/>
          <geom name="pole2_geom" type="capsule" fromto="0 0 0 0 0 0.3"
                size="0.015" mass="0.1" contype="0" conaffinity="0"/>
          <site name="tip2" pos="0 0 0.3"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="slide0" gear="10" ctrlrange="-1 1" ctrllimited="true"/>
    <motor joint="hinge0" gear="2" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>
</mujoco>
"""

# Free + ball joints (floating box with a ball-jointed arm). No contacts.
FLOATER = """
<mujoco model="floater">
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="base" pos="0 0 1">
      <freejoint name="root"/>
      <geom name="base_geom" type="box" size="0.1 0.08 0.06" mass="2.0"
            contype="0" conaffinity="0"/>
      <body name="arm" pos="0.1 0 0">
        <joint name="ball0" type="ball" damping="0.05"/>
        <geom name="arm_geom" type="capsule" fromto="0 0 0 0.3 0 0"
              size="0.02" mass="0.2" contype="0" conaffinity="0"/>
        <site name="hand" pos="0.3 0 0"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

# Ball bouncing on a plane: contact test (plane-sphere), friction.
BOUNCE = """
<mujoco model="bounce">
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1" friction="1 0.005 0.0001"/>
    <body name="ball" pos="0 0 0.5">
      <freejoint/>
      <geom name="ball_geom" type="sphere" size="0.1" mass="0.5"
            friction="1 0.005 0.0001"/>
    </body>
  </worldbody>
</mujoco>
"""
"""Capsule pendulum hitting the floor: plane-capsule contact + limits."""
CAPSULE_FLOOR = """
<mujoco model="capsule_floor">
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="link" pos="0 0 0.35">
      <joint name="hinge" type="hinge" axis="0 1 0" range="-170 170"
             limited="true"/>
      <geom name="rod" type="capsule" fromto="0 0 0 0.4 0 0" size="0.03"
            mass="0.4"/>
    </body>
  </worldbody>
</mujoco>
"""

# Fixed + spatial tendons with spring/damper/limits; tendon-driven motor.
TENDON = """
<mujoco model="tendon">
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="upper" pos="0 0 1">
      <joint name="shoulder" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom name="upper_geom" type="capsule" fromto="0 0 0 0.3 0 0"
            size="0.02" mass="0.4" contype="0" conaffinity="0"/>
      <site name="s_mid" pos="0.15 0 0.03"/>
      <body name="lower" pos="0.3 0 0">
        <joint name="elbow" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom name="lower_geom" type="capsule" fromto="0 0 0 0.25 0 0"
              size="0.015" mass="0.2" contype="0" conaffinity="0"/>
        <site name="s_end" pos="0.2 0 0.02"/>
      </body>
    </body>
    <site name="s_base" pos="0.05 0 1.06"/>
  </worldbody>
  <tendon>
    <fixed name="coupler" stiffness="3.0" damping="0.2" springlength="0.1">
      <joint joint="shoulder" coef="1.0"/>
      <joint joint="elbow" coef="-0.5"/>
    </fixed>
    <spatial name="string" stiffness="8.0" damping="0.1"
             range="0.0 0.55" limited="true">
      <site site="s_base"/>
      <site site="s_mid"/>
      <site site="s_end"/>
    </spatial>
  </tendon>
  <actuator>
    <motor tendon="string" gear="2" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>
</mujoco>
"""

# Muscle actuator on a hinge pair via a spatial tendon.
MUSCLE = """
<mujoco model="muscle">
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="arm" pos="0 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0" range="-60 60"
             damping="0.1"/>
      <geom name="arm_geom" type="capsule" fromto="0 0 0 0.3 0 0"
            size="0.02" mass="0.5" contype="0" conaffinity="0"/>
      <site name="m_ins" pos="0.1 0 0.02"/>
    </body>
    <site name="m_org" pos="-0.05 0 1.08"/>
  </worldbody>
  <tendon>
    <spatial name="flexor">
      <site site="m_org"/>
      <site site="m_ins"/>
    </spatial>
  </tendon>
  <actuator>
    <muscle name="flex" tendon="flexor" ctrlrange="0 1"/>
  </actuator>
</mujoco>
"""

ACTLIMITED = """
<mujoco model="actlimited">
  <option timestep="0.005"/>
  <worldbody>
    <body pos="0 0 0.5">
      <joint name="h" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.02" mass="0.3"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    <general name="filt" joint="h" dyntype="filter" dynprm="0.05"
             gainprm="2.0" actlimited="true" actrange="-0.4 0.4"
             ctrllimited="true" ctrlrange="-2 2"/>
  </actuator>
</mujoco>
"""
