"""Task base: model + pure-JAX residual + cost spec + host-side transition.

Reference semantics: mjpc/task.{h,cc} — a Task couples an MJCF model with a
residual function and a cost built from user-sensor specs. In the TPU build
the residual is a pure JAX function of (Model, Data, params) evaluated
inside rollouts on device; mode machines (Transition) stay host-side and
feed mode/mocap/userdata into rollouts as inputs, like the reference passes
them into Trajectory::Rollout (trajectory.cc:121-127).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.costs import spec as cost_spec_lib
from mujoco_mpc_tpu.physics import model as model_lib


def _text_items(mjm) -> dict:
  """name -> data for <custom><text> entries (raw-buffer access; this
  mujoco build has no MjModel.text() accessor)."""
  out = {}
  names = bytes(mjm.names)
  for i in range(mjm.ntext):
    nadr = int(mjm.name_textadr[i])
    name = names[nadr:names.index(b"\x00", nadr)].decode()
    adr, size = int(mjm.text_adr[i]), int(mjm.text_size[i])
    data = bytes(mjm.text_data[adr:adr + size]).rstrip(b"\x00").decode()
    out[name] = data
  return out


class Task:
  """Base class for tasks. Subclasses define XML + residual()."""

  name: str = "Task"

  def __init__(self, dtype=jnp.float32, model_override=None):
    """model_override: replacement model as an XML string or mjb bytes —
    the gRPC Init(model=...) capability (reference grpc_agent_util.cc
    InitAgent + LoadModelFrom{String,Bytes}): physics runs the supplied
    model while the task's residual/cost conventions still apply."""
    import mujoco
    if isinstance(model_override, bytes):
      import tempfile
      with tempfile.NamedTemporaryFile(suffix=".mjb") as f:
        f.write(model_override)
        f.flush()
        self.mjm = mujoco.MjModel.from_binary_path(f.name)
    elif isinstance(model_override, str):
      self.mjm = mujoco.MjModel.from_xml_string(model_override,
                                                self.assets())
    else:
      xml = self.xml()
      if xml.strip().startswith("<"):
        self.mjm = mujoco.MjModel.from_xml_string(xml, self.assets())
      else:
        self.mjm = mujoco.MjModel.from_xml_path(xml)
    # hook for procedural asset data (e.g. hfield elevation grids) that
    # MJCF cannot express inline — runs before the device transfer
    self.prepare_mjm(self.mjm)
    self.model = model_lib.put_model(self.mjm, dtype=dtype)
    # planning model: the reference overrides timestep/integrator for the
    # planner's internal model (agent_timestep / agent_integrator custom
    # numerics, agent.cc:274-276); physics stepping keeps the sim model.
    # Tasks may additionally supply a REDUCED planning geometry via
    # plan_xml() (same state/actuation dims, simplified collision) — the
    # reference ships separate plan vs simulate models for exactly this
    # (mjpc/tasks/*/task.xml vs the GUI model).
    plan_xml = self.plan_xml()
    if plan_xml is not None and model_override is None:
      import mujoco as _mj
      mjm_plan = _mj.MjModel.from_xml_string(plan_xml, self.assets())
      self.prepare_mjm(mjm_plan)
      assert (mjm_plan.nq, mjm_plan.nv, mjm_plan.nu, mjm_plan.na) == \
          (self.mjm.nq, self.mjm.nv, self.mjm.nu, self.mjm.na), \
          "plan model must match the sim model's state/actuation dims"
      self.plan_model = model_lib.put_model(mjm_plan, dtype=dtype)
    else:
      self.plan_model = self.model
    agent_dt = cost_spec_lib.get_number_or_default(
        self.mjm, "agent_timestep", 0.0)
    if agent_dt > 0 and abs(agent_dt - float(self.mjm.opt.timestep)) > 1e-12:
      import jax.numpy as _jnp
      self.plan_model = self.plan_model.replace(
          opt=self.plan_model.opt.replace(
              timestep=_jnp.asarray(agent_dt, dtype)))
    agent_integrator = cost_spec_lib.get_number_or_default(
        self.mjm, "agent_integrator", -1.0)
    if agent_integrator >= 0:
      self.plan_model = self.plan_model.replace(
          opt=self.plan_model.opt.replace(
              integrator=int(agent_integrator)))
    self.cost_spec = cost_spec_lib.parse_cost_spec(self.mjm, dtype=dtype)
    self.residual_params = cost_spec_lib.parse_residual_params(
        self.mjm, dtype=dtype)
    self.mode = 0

  # -- modes (reference: `task_transition` custom text lists mode names,
  # agent.cc:416-423) --------------------------------------------------------

  @property
  def modes(self) -> list:
    data = _text_items(self.mjm).get("task_transition")
    if data:
      return [s for s in data.replace("\x00", "|").split("|") if s]
    return ["default"]

  @property
  def mode_name(self) -> str:
    modes = self.modes
    return modes[self.mode] if self.mode < len(modes) else modes[0]

  def set_mode_by_name(self, name: str):
    self.mode = self.modes.index(name)

  def selection_options(self, name: str) -> list:
    """Options for residual_select_* parameters (from custom text)."""
    data = _text_items(self.mjm).get(f"residual_list_{name}")
    if data:
      return [s for s in data.replace("\x00", "|").split("|") if s]
    return []

  def set_selection(self, name: str, index: int):
    import jax.numpy as jnp
    idx = 0
    for i in range(self.mjm.nnumeric):
      nm = self.mjm.numeric(i).name
      if nm.startswith("residual_"):
        if nm == f"residual_select_{name}":
          self.residual_params = self.residual_params.at[idx].set(
              float(index))
          return
        idx += 1
    raise KeyError(name)

  # -- to override -----------------------------------------------------------

  def xml(self) -> str:
    raise NotImplementedError

  def assets(self) -> Optional[dict]:
    return None

  def prepare_mjm(self, mjm):
    """Fill procedural asset data (hfield grids, mocap clips) on the raw
    MjModel before it is converted for the device. Default: no-op."""

  def plan_xml(self) -> Optional[str]:
    """Optional reduced planning-geometry MJCF (same nq/nv/nu/na as
    xml()); None = plan on the simulation model."""
    return None

  def residual(self, m: model_lib.Model, d: model_lib.Data,
               params: jax.Array) -> jax.Array:
    """Pure JAX residual vector (num_residual,)."""
    raise NotImplementedError

  def transition(self, d: model_lib.Data) -> model_lib.Data:
    """Host-side per-control-step mode machine (default: none)."""
    return d

  # -- config (reference XML custom-numeric conventions) ---------------------

  def config(self, name: str, default):
    return cost_spec_lib.get_number_or_default(self.mjm, name, default)

  @property
  def home_qpos(self) -> Optional[np.ndarray]:
    import mujoco
    for k in range(self.mjm.nkey):
      if self.mjm.key(k).name == "home":
        return np.array(self.mjm.key_qpos[k])
    return None

  def make_data(self) -> model_lib.Data:
    d = model_lib.make_data(self.model)
    home = self.home_qpos
    if home is not None:
      d = d.replace(qpos=jnp.asarray(home, d.qpos.dtype))
    return d

  def cost(self, residual: jax.Array) -> jax.Array:
    return self.cost_spec.cost(residual)
