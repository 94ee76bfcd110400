"""Headless gRPC agent service (reference: mjpc/grpc/agent_service.{h,cc}).

Serves the `agent.Agent` service over grpcio. Because the environment has
no protoc gRPC plugin, method handlers are registered with
grpc.method_handlers_generic_handler + the protoc-generated message module
(agent_pb2) — wire-identical to stub-generated servers.

Semantics mirrored from the reference:
  * Init(task_id | model) builds the agent for a registered task;
  * Step = apply policy action then advance physics + task transition
    (agent_service.cc:225-245);
  * PlannerStep = one planner iteration from the current state (:213-223);
  * GetAction(time, averaging_duration, nominal_action) with rollout
    averaging semantics (grpc_agent_util.cc:166-229);
  * name-based weight/parameter/mode setters (grpc_agent_util.cc).
"""

from __future__ import annotations

import concurrent.futures as futures
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import agent_pb2  # noqa: E402

import grpc  # noqa: E402


class AgentServicer:
  """Implements agent.Agent."""

  def __init__(self):
    self.agent = None
    self.task = None

  # -- helpers ---------------------------------------------------------------

  def _require(self):
    if self.agent is None:
      raise RuntimeError("Init not called")
    return self.agent

  # -- rpc implementations ---------------------------------------------------

  def Init(self, request, context):
    import jax.numpy as jnp
    from mujoco_mpc_tpu.agent.agent import Agent
    from mujoco_mpc_tpu.tasks import registry

    task_id = request.task_id or "Cartpole"
    # model override from request bytes/xml (grpc_agent_util.cc InitAgent)
    override = None
    if request.HasField("model"):
      if request.model.HasField("xml") and request.model.xml:
        override = request.model.xml
      elif request.model.HasField("mjb") and request.model.mjb:
        override = bytes(request.model.mjb)
    if override is not None:
      self.task = registry.get_task(task_id, model_override=override)
    else:
      self.task = registry.get_task(task_id)
    self.agent = Agent(self.task)
    return agent_pb2.InitResponse()

  def GetState(self, request, context):
    import jax.numpy as jnp
    agent = self._require()
    d = agent.data
    state = agent_pb2.State(
        time=float(d.time),
        qpos=np.asarray(d.qpos, np.float64).tolist(),
        qvel=np.asarray(d.qvel, np.float64).tolist(),
        act=np.asarray(d.act, np.float64).tolist(),
        mocap_pos=np.asarray(d.mocap_pos, np.float64).ravel().tolist(),
        mocap_quat=np.asarray(d.mocap_quat, np.float64).ravel().tolist(),
        userdata=np.asarray(d.userdata, np.float64).tolist(),
    )
    return agent_pb2.GetStateResponse(state=state)

  def SetState(self, request, context):
    """Set (a subset of) the physics state. Every sized field is
    validated BEFORE any is applied and bad sizes abort with
    INVALID_ARGUMENT (reference grpc_agent_util.cc SetState size checks
    return InvalidArgument; explicit checks, not asserts — python -O
    must not strip validation)."""
    import jax.numpy as jnp
    agent = self._require()
    s = request.state
    d = agent.data

    def check(name, got, want):
      if got != want:
        context.abort(
            grpc.StatusCode.INVALID_ARGUMENT,
            f"{name} size mismatch: got {got}, expected {want}.")

    if s.qpos:
      check("qpos", len(s.qpos), int(agent.m.nq))
    if s.qvel:
      check("qvel", len(s.qvel), int(agent.m.nv))
    if s.act:
      check("act", len(s.act), int(d.act.shape[0]))
    if s.mocap_pos:
      check("mocap_pos", len(s.mocap_pos), 3 * int(d.mocap_pos.shape[0]))
    if s.mocap_quat:
      check("mocap_quat", len(s.mocap_quat), 4 * int(d.mocap_quat.shape[0]))
    if s.userdata:
      check("userdata", len(s.userdata), int(d.userdata.shape[0]))

    dtype = d.qpos.dtype
    if s.qpos:
      d = d.replace(qpos=jnp.asarray(np.array(s.qpos), dtype))
    if s.qvel:
      d = d.replace(qvel=jnp.asarray(np.array(s.qvel), dtype))
    if s.act:
      d = d.replace(act=jnp.asarray(np.array(s.act), dtype))
    if s.HasField("time"):
      d = d.replace(time=jnp.asarray(s.time, dtype))
    if s.mocap_pos:
      d = d.replace(mocap_pos=jnp.asarray(
          np.array(s.mocap_pos).reshape(-1, 3), dtype))
    if s.mocap_quat:
      d = d.replace(mocap_quat=jnp.asarray(
          np.array(s.mocap_quat).reshape(-1, 4), dtype))
    if s.userdata:
      d = d.replace(userdata=jnp.asarray(np.array(s.userdata), dtype))
    d = agent._forward(d)
    agent.data = d
    return agent_pb2.SetStateResponse()

  def GetAction(self, request, context):
    import jax
    import jax.numpy as jnp
    agent = self._require()
    time = request.time if request.HasField("time") else float(
        agent.data.time)
    nominal = bool(request.nominal_action)

    def policy_action(t, d):
      if not nominal and agent._planner_takes_state:
        state = jnp.concatenate([d.qpos, d.qvel, d.act])
        return agent.planner.action(t, state=state)
      return agent.planner.action(t)

    if request.averaging_duration > 0:
      h = float(agent.m.opt.timestep)
      n = max(1, int(round(request.averaging_duration / h)))
      if nominal:
        # average the policy over the window without stepping physics
        # (grpc_agent_util.cc AverageAction nominal branch, :176-183)
        actions = [np.asarray(agent.planner.action(time + i * h))
                   for i in range(n)]
      else:
        # roll PHYSICS forward from the current state, querying the
        # policy (with state feedback where supported) at each step and
        # averaging the applied actions (:184-196)
        d = agent.data.replace(time=jnp.asarray(time, agent.data.qpos.dtype))
        actions = []
        for _ in range(n):
          u = policy_action(float(d.time), d)
          actions.append(np.asarray(u))
          d = agent._step(d.replace(ctrl=u))
      action = np.mean(actions, axis=0)
    else:
      action = np.asarray(policy_action(time, agent.data))
    return agent_pb2.GetActionResponse(action=action.tolist())

  def PlannerStep(self, request, context):
    agent = self._require()
    agent.plan_iteration()
    return agent_pb2.PlannerStepResponse()

  def Step(self, request, context):
    agent = self._require()
    if request.use_previous_policy:
      agent.step_env(action=agent.action_previous())
    else:
      agent.step_env()
    return agent_pb2.StepResponse()

  def Reset(self, request, context):
    agent = self._require()
    agent.reset()
    return agent_pb2.ResetResponse()

  def SetTaskParameters(self, request, context):
    agent = self._require()
    for name, v in request.parameters.items():
      if v.WhichOneof("value") == "numeric":
        agent.set_task_parameter(name, v.numeric)
      else:
        agent.set_task_parameter_selection(name, v.selection)
    return agent_pb2.SetTaskParametersResponse()

  def GetTaskParameters(self, request, context):
    agent = self._require()
    resp = agent_pb2.GetTaskParametersResponse()
    for name, value in agent.get_task_parameters().items():
      if name.startswith("select_"):
        # selection params answer with the option STRING
        # (reference grpc_agent_util.cc GetTaskParameters oneof)
        short = name[len("select_"):]
        options = agent.task.selection_options(short)
        idx = int(round(float(value)))
        if not 0 <= idx < len(options):
          # never fall through to the numeric oneof: clients switching
          # on the oneof must not see a type change on a stale index
          context.abort(
              grpc.StatusCode.INVALID_ARGUMENT,
              f"selection parameter '{short}' holds invalid index {idx} "
              f"(options: {options})")
        resp.parameters[short].selection = options[idx]
        continue
      resp.parameters[name].numeric = float(value)
    return resp

  def SetCostWeights(self, request, context):
    agent = self._require()
    if request.reset_to_defaults:
      agent.reset_cost_weights()
    for name, w in request.cost_weights.items():
      agent.set_cost_weight(name, w)
    return agent_pb2.SetCostWeightsResponse()

  def GetResiduals(self, request, context):
    agent = self._require()
    resp = agent_pb2.GetResidualsResponse()
    r = agent.task.residual(agent.m, agent.data,
                            agent.task.residual_params)
    r = np.asarray(r, np.float64)
    off = 0
    cs = agent.task.cost_spec
    for k, name in enumerate(cs.term_names):
      resp.values[name].values.extend(r[off:off + cs.dims[k]].tolist())
      off += cs.dims[k]
    return resp

  def GetCostValuesAndWeights(self, request, context):
    agent = self._require()
    resp = agent_pb2.GetCostValuesAndWeightsResponse()
    terms = agent.get_cost_term_values(weighted=False)
    weights = agent.get_cost_weights()
    cs = agent.task.cost_spec
    for k, name in enumerate(cs.term_names):
      # unweighted norm value + weight (agent.proto semantics); computed
      # unweighted directly so zero-weighted terms report their true value
      resp.values_weights[name].value = float(terms[name])
      resp.values_weights[name].weight = float(weights[name])
    return resp

  def SetMode(self, request, context):
    agent = self._require()
    agent.set_mode(request.mode)
    return agent_pb2.SetModeResponse()

  def GetMode(self, request, context):
    agent = self._require()
    return agent_pb2.GetModeResponse(mode=agent.get_mode())

  def GetAllModes(self, request, context):
    agent = self._require()
    return agent_pb2.GetAllModesResponse(mode_names=agent.get_all_modes())

  def GetBestTrajectory(self, request, context):
    agent = self._require()
    traj = agent.best_trajectory()
    resp = agent_pb2.GetBestTrajectoryResponse()
    if traj is not None:
      resp.states.extend(np.asarray(traj["states"],
                                    np.float64).ravel().tolist())
      resp.actions.extend(np.asarray(traj["actions"],
                                     np.float64).ravel().tolist())
      resp.times.extend(np.asarray(traj["times"],
                                   np.float64).ravel().tolist())
      resp.steps = int(traj["steps"])
    return resp

  def SetAnything(self, request, context):
    if request.HasField("state"):
      self.SetState(agent_pb2.SetStateRequest(state=request.state), context)
    if request.parameters:
      self.SetTaskParameters(
          agent_pb2.SetTaskParametersRequest(parameters=request.parameters),
          context)
    if request.cost_weights:
      self.SetCostWeights(
          agent_pb2.SetCostWeightsRequest(cost_weights=request.cost_weights),
          context)
    if request.mode:
      self.SetMode(agent_pb2.SetModeRequest(mode=request.mode), context)
    if request.mocap:
      self._set_mocap(request.mocap, context)
    return agent_pb2.SetAnythingResponse()

  def _set_mocap(self, mocap_map, context):
    """Named per-body mocap poses (reference grpc_agent_util.cc
    SetMocap:442-478): validate every name/size BEFORE applying, and
    surface bad input as INVALID_ARGUMENT like the reference (explicit
    checks, not asserts — python -O must not strip validation)."""
    import jax.numpy as jnp
    import mujoco
    agent = self._require()
    mjm = agent.task.mjm
    ids = {}
    for name, pose in mocap_map.items():
      body = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_BODY, name)
      if body < 0:
        context.abort(grpc.StatusCode.INVALID_ARGUMENT,
                      f"Body '{name}' not found.")
      mocap_id = int(mjm.body_mocapid[body])
      if mocap_id < 0:
        context.abort(grpc.StatusCode.INVALID_ARGUMENT,
                      f"Body '{name}' is not a mocap body.")
      if len(pose.pos) not in (0, 3):
        context.abort(
            grpc.StatusCode.INVALID_ARGUMENT,
            f"Mocap '{name}' has invalid pose size {len(pose.pos)}.")
      if len(pose.quat) not in (0, 4):
        context.abort(
            grpc.StatusCode.INVALID_ARGUMENT,
            f"Mocap '{name}' has invalid quat size {len(pose.quat)}.")
      ids[name] = mocap_id
    d = agent.data
    dtype = d.qpos.dtype
    mpos = np.asarray(d.mocap_pos, np.float64).copy()
    mquat = np.asarray(d.mocap_quat, np.float64).copy()
    for name, pose in mocap_map.items():
      if len(pose.pos) == 3:
        mpos[ids[name]] = np.array(pose.pos)
      if len(pose.quat) == 4:
        mquat[ids[name]] = np.array(pose.quat)
    agent.data = d.replace(mocap_pos=jnp.asarray(mpos, dtype),
                           mocap_quat=jnp.asarray(mquat, dtype))


_RPCS = [
    ("Init", agent_pb2.InitRequest, agent_pb2.InitResponse),
    ("GetState", agent_pb2.GetStateRequest, agent_pb2.GetStateResponse),
    ("SetState", agent_pb2.SetStateRequest, agent_pb2.SetStateResponse),
    ("GetAction", agent_pb2.GetActionRequest, agent_pb2.GetActionResponse),
    ("PlannerStep", agent_pb2.PlannerStepRequest,
     agent_pb2.PlannerStepResponse),
    ("Step", agent_pb2.StepRequest, agent_pb2.StepResponse),
    ("Reset", agent_pb2.ResetRequest, agent_pb2.ResetResponse),
    ("SetTaskParameters", agent_pb2.SetTaskParametersRequest,
     agent_pb2.SetTaskParametersResponse),
    ("GetTaskParameters", agent_pb2.GetTaskParametersRequest,
     agent_pb2.GetTaskParametersResponse),
    ("SetCostWeights", agent_pb2.SetCostWeightsRequest,
     agent_pb2.SetCostWeightsResponse),
    ("GetResiduals", agent_pb2.GetResidualsRequest,
     agent_pb2.GetResidualsResponse),
    ("GetCostValuesAndWeights", agent_pb2.GetCostValuesAndWeightsRequest,
     agent_pb2.GetCostValuesAndWeightsResponse),
    ("SetMode", agent_pb2.SetModeRequest, agent_pb2.SetModeResponse),
    ("GetMode", agent_pb2.GetModeRequest, agent_pb2.GetModeResponse),
    ("GetAllModes", agent_pb2.GetAllModesRequest,
     agent_pb2.GetAllModesResponse),
    ("GetBestTrajectory", agent_pb2.GetBestTrajectoryRequest,
     agent_pb2.GetBestTrajectoryResponse),
    ("SetAnything", agent_pb2.SetAnythingRequest,
     agent_pb2.SetAnythingResponse),
]


def make_server(port: int = 0, max_workers: int = 4):
  """Create (server, bound_port)."""
  servicer = AgentServicer()
  handlers = {
      name: grpc.unary_unary_rpc_method_handler(
          getattr(servicer, name),
          request_deserializer=req.FromString,
          response_serializer=lambda msg: msg.SerializeToString(),
      )
      for name, req, resp in _RPCS
  }
  generic = grpc.method_handlers_generic_handler("agent.Agent", handlers)
  server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
  server.add_generic_rpc_handlers((generic,))
  bound = server.add_insecure_port(f"localhost:{port}")
  return server, servicer, bound


def _apply_platform_override():
  """Backend + persistent-compile-cache setup for a spawned
  server process (grpc/serverenv.py)."""
  from mujoco_mpc_tpu.grpc import serverenv
  serverenv.apply()


def main():
  _apply_platform_override()
  import argparse
  p = argparse.ArgumentParser()
  p.add_argument("--mjpc_port", type=int, default=0)
  args = p.parse_args()
  server, _, port = make_server(args.mjpc_port)
  server.start()
  print(f"agent server listening on {port}", flush=True)
  server.wait_for_termination()


if __name__ == "__main__":
  main()
