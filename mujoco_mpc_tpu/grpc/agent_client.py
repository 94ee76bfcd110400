"""Python client for the agent gRPC service.

API mirrors the reference client (python/mujoco_mpc/agent.py:68-392) so
user code ports directly: Agent(task_id=...) spawns a server subprocess on
a free port (or connects to `server_addr`), and exposes get_state /
set_state / get_action / planner_step / step / reset / cost + parameter +
mode accessors.
"""

from __future__ import annotations

import atexit
import os
import socket
import subprocess
import sys
import time
from typing import Optional

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import agent_pb2  # noqa: E402

import grpc  # noqa: E402

_RPC_NAMES = [
    "Init", "GetState", "SetState", "GetAction", "PlannerStep", "Step",
    "Reset", "SetTaskParameters", "GetTaskParameters", "SetCostWeights",
    "GetResiduals", "GetCostValuesAndWeights", "SetMode", "GetMode",
    "GetAllModes", "GetBestTrajectory", "SetAnything",
]


class _Stub:
  """Hand-rolled stub (no grpc protoc plugin in this environment)."""

  def __init__(self, channel):
    for name in _RPC_NAMES:
      resp_cls = getattr(agent_pb2, f"{name}Response")
      setattr(
          self, name,
          channel.unary_unary(
              f"/agent.Agent/{name}",
              request_serializer=lambda msg: msg.SerializeToString(),
              response_deserializer=resp_cls.FromString))


def _find_free_port() -> int:
  with socket.socket() as s:
    s.bind(("localhost", 0))
    return s.getsockname()[1]


class Agent:
  """Drop-in equivalent of mujoco_mpc.agent.Agent."""

  def __init__(self, task_id: str = "Cartpole",
               server_addr: Optional[str] = None,
               real_time_speed: float = 1.0,
               ui_server: bool = False):
    """ui_server=True spawns the live-loop UiAgentService (reference
    ui_agent_server) instead of the synchronous AgentService."""
    self._proc = None
    if server_addr is None:
      port = _find_free_port()
      server_py = os.path.join(
          os.path.dirname(__file__),
          "ui_agent_service.py" if ui_server else "agent_service.py")
      env = dict(os.environ)
      repo = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
      # APPEND to any existing PYTHONPATH (e.g. a site-customization
      # path) — overwriting it breaks the parent interpreter's plugins,
      # omitting the repo breaks the child's imports
      env["PYTHONPATH"] = (repo if not env.get("PYTHONPATH")
                           else env["PYTHONPATH"] + os.pathsep + repo)
      self._proc = subprocess.Popen(
          [sys.executable, server_py, "--mjpc_port", str(port)], env=env)
      atexit.register(self.close)
      server_addr = f"localhost:{port}"
    self.channel = grpc.insecure_channel(server_addr)
    grpc.channel_ready_future(self.channel).result(timeout=120)
    self.stub = _Stub(self.channel)
    self.stub.Init(agent_pb2.InitRequest(
        task_id=task_id, real_time_speed=real_time_speed),
        wait_for_ready=True, timeout=300)

  def close(self):
    if self._proc is not None:
      self._proc.terminate()
      try:
        self._proc.wait(timeout=5)
      except subprocess.TimeoutExpired:
        self._proc.kill()
      self._proc = None

  # -- reference-parity API --------------------------------------------------

  def get_state(self):
    return self.stub.GetState(agent_pb2.GetStateRequest()).state

  def set_state(self, time=None, qpos=None, qvel=None, act=None,
                mocap_pos=None, mocap_quat=None, userdata=None):
    state = agent_pb2.State(
        time=time if time is not None else None,
        qpos=np.asarray(qpos).ravel().tolist() if qpos is not None else [],
        qvel=np.asarray(qvel).ravel().tolist() if qvel is not None else [],
        act=np.asarray(act).ravel().tolist() if act is not None else [],
        mocap_pos=(np.asarray(mocap_pos).ravel().tolist()
                   if mocap_pos is not None else []),
        mocap_quat=(np.asarray(mocap_quat).ravel().tolist()
                    if mocap_quat is not None else []),
        userdata=(np.asarray(userdata).ravel().tolist()
                  if userdata is not None else []),
    )
    self.stub.SetState(agent_pb2.SetStateRequest(state=state))

  def get_action(self, time=None, averaging_duration=0.0,
                 nominal_action=False) -> np.ndarray:
    req = agent_pb2.GetActionRequest(
        averaging_duration=averaging_duration,
        nominal_action=nominal_action)
    if time is not None:
      req.time = time
    return np.array(self.stub.GetAction(req).action)

  def planner_step(self):
    self.stub.PlannerStep(agent_pb2.PlannerStepRequest())

  def step(self, use_previous_policy: bool = False):
    self.stub.Step(agent_pb2.StepRequest(
        use_previous_policy=use_previous_policy))

  def reset(self):
    self.stub.Reset(agent_pb2.ResetRequest())

  def set_task_parameter(self, name: str, value: float):
    self.set_task_parameters({name: value})

  def set_task_parameters(self, parameters: dict):
    req = agent_pb2.SetTaskParametersRequest()
    for name, value in parameters.items():
      if isinstance(value, str):
        req.parameters[name].selection = value
      else:
        req.parameters[name].numeric = value
    self.stub.SetTaskParameters(req)

  def get_task_parameters(self) -> dict:
    resp = self.stub.GetTaskParameters(agent_pb2.GetTaskParametersRequest())
    return {
        name: (v.numeric if v.WhichOneof("value") == "numeric"
               else v.selection)
        for name, v in resp.parameters.items()
    }

  def set_cost_weights(self, weights: dict, reset_to_defaults=False):
    req = agent_pb2.SetCostWeightsRequest(reset_to_defaults=reset_to_defaults)
    for name, w in weights.items():
      req.cost_weights[name] = w
    self.stub.SetCostWeights(req)

  def get_residuals(self) -> dict:
    resp = self.stub.GetResiduals(agent_pb2.GetResidualsRequest())
    return {name: np.array(r.values) for name, r in resp.values.items()}

  def get_cost_weights(self) -> dict:
    resp = self.stub.GetCostValuesAndWeights(
        agent_pb2.GetCostValuesAndWeightsRequest())
    return {name: vw.weight for name, vw in resp.values_weights.items()}

  def get_total_cost(self) -> float:
    resp = self.stub.GetCostValuesAndWeights(
        agent_pb2.GetCostValuesAndWeightsRequest())
    return sum(vw.value * vw.weight
               for vw in resp.values_weights.values())

  def get_cost_term_values(self) -> dict:
    resp = self.stub.GetCostValuesAndWeights(
        agent_pb2.GetCostValuesAndWeightsRequest())
    return {name: vw.value for name, vw in resp.values_weights.items()}

  def set_mode(self, mode: str):
    self.stub.SetMode(agent_pb2.SetModeRequest(mode=mode))

  def get_mode(self) -> str:
    return self.stub.GetMode(agent_pb2.GetModeRequest()).mode

  def get_all_modes(self):
    return list(
        self.stub.GetAllModes(agent_pb2.GetAllModesRequest()).mode_names)

  def best_trajectory(self):
    resp = self.stub.GetBestTrajectory(agent_pb2.GetBestTrajectoryRequest())
    steps = resp.steps or 1
    return {
        "states": np.array(resp.states).reshape(steps, -1),
        "actions": np.array(resp.actions).reshape(steps, -1),
        "times": np.array(resp.times),
    }

  def init(self, task_id: str, model=None, real_time_speed: float = 1.0):
    """Re-initialize the server with a task and optional model override
    (reference agent.py init: MjModel -> mjb bytes)."""
    req = agent_pb2.InitRequest(task_id=task_id,
                                real_time_speed=real_time_speed)
    if model is not None:
      if isinstance(model, bytes):
        req.model.mjb = model
      elif isinstance(model, str):
        req.model.xml = model
      else:  # a mujoco.MjModel
        import mujoco
        buf = np.empty(mujoco.mj_sizeModel(model), dtype=np.uint8)
        mujoco.mj_saveModel(model, None, buf)
        req.model.mjb = buf.tobytes()
    self.stub.Init(req, wait_for_ready=True, timeout=300)

  def set_mocap(self, mocap_map):
    """Named per-body mocap poses via SetAnything (reference
    agent.py set_mocap:385-392). mocap_map: name -> Pose."""
    req = agent_pb2.SetAnythingRequest()
    for name, pose in mocap_map.items():
      if pose.pos is not None:
        req.mocap[name].pos.extend(np.asarray(pose.pos).ravel().tolist())
      if pose.quat is not None:
        req.mocap[name].quat.extend(
            np.asarray(pose.quat).ravel().tolist())
    self.stub.SetAnything(req)

  def set_parameters(self, parameters):
    """Apply an mjpc_parameters.MjpcParameters bundle (reference
    agent.py set_parameters:359-366)."""
    if parameters.mode is not None:
      self.set_mode(parameters.mode)
    if parameters.task_parameters:
      self.set_task_parameters(parameters.task_parameters)
    if parameters.cost_weights:
      self.set_cost_weights(parameters.cost_weights)
    if parameters.mocap:
      self.set_mocap(parameters.mocap)

  def __enter__(self):
    return self

  def __exit__(self, *a):
    self.close()
