"""gRPC agent service tests.

Reference pattern: mjpc/test/grpc/agent_service_test.cc instantiates the
service in-process; python/mujoco_mpc/agent_test.py exercises a spawned
server end-to-end (cartpole cost decreases, set/get roundtrips).
"""

import numpy as np
import pytest

import grpc

from mujoco_mpc_tpu.grpc import agent_pb2
from mujoco_mpc_tpu.grpc.agent_service import make_server
from mujoco_mpc_tpu.grpc.agent_client import _Stub


@pytest.fixture(scope="module")
def stub():
  server, servicer, port = make_server()
  server.start()
  channel = grpc.insecure_channel(f"localhost:{port}")
  stub = _Stub(channel)
  stub.Init(agent_pb2.InitRequest(task_id="Cartpole"))
  yield stub
  server.stop(0)


def test_state_roundtrip(stub):
  stub.Reset(agent_pb2.ResetRequest())
  state = agent_pb2.State(qpos=[0.5, 1.0], qvel=[0.1, -0.1])
  stub.SetState(agent_pb2.SetStateRequest(state=state))
  got = stub.GetState(agent_pb2.GetStateRequest()).state
  np.testing.assert_allclose(got.qpos, [0.5, 1.0], atol=1e-5)
  np.testing.assert_allclose(got.qvel, [0.1, -0.1], atol=1e-5)


def test_bad_state_size_rejected(stub):
  """Wrong-size fields return INVALID_ARGUMENT (not a bare assert that
  python -O would strip — reference grpc_agent_util.cc size checks
  return InvalidArgument), and the server survives."""
  for bad in (agent_pb2.State(qpos=[1.0, 2.0, 3.0]),
              agent_pb2.State(qvel=[1.0]),
              agent_pb2.State(act=[0.5]),
              agent_pb2.State(userdata=[0.0] * 99)):
    with pytest.raises(grpc.RpcError) as e:
      stub.SetState(agent_pb2.SetStateRequest(state=bad))
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT, bad
    assert "size mismatch" in e.value.details()
  # a valid call still works afterwards
  stub.SetState(agent_pb2.SetStateRequest(
      state=agent_pb2.State(qpos=[0.0, 0.1])))


def test_planner_improves_cost(stub):
  stub.Reset(agent_pb2.ResetRequest())
  stub.SetState(agent_pb2.SetStateRequest(
      state=agent_pb2.State(qpos=[0.0, 2.4])))
  for _ in range(6):
    stub.PlannerStep(agent_pb2.PlannerStepRequest())
    stub.Step(agent_pb2.StepRequest())
  act = stub.GetAction(agent_pb2.GetActionRequest()).action
  assert len(act) == 1
  assert np.all(np.abs(np.array(act)) <= 1.0)


def test_cost_weights_and_residuals(stub):
  resp = stub.GetCostValuesAndWeights(
      agent_pb2.GetCostValuesAndWeightsRequest())
  names = set(resp.values_weights.keys())
  assert names == {"Vertical", "Centered", "Velocity", "Control"}
  stub.SetCostWeights(agent_pb2.SetCostWeightsRequest(
      cost_weights={"Velocity": 0.5}))
  resp = stub.GetCostValuesAndWeights(
      agent_pb2.GetCostValuesAndWeightsRequest())
  assert abs(resp.values_weights["Velocity"].weight - 0.5) < 1e-6
  res = stub.GetResiduals(agent_pb2.GetResidualsRequest())
  assert set(res.values.keys()) == names


def test_task_parameters(stub):
  stub.SetTaskParameters(agent_pb2.SetTaskParametersRequest())
  req = agent_pb2.SetTaskParametersRequest()
  req.parameters["Goal"].numeric = 0.7
  stub.SetTaskParameters(req)
  got = stub.GetTaskParameters(agent_pb2.GetTaskParametersRequest())
  assert abs(got.parameters["Goal"].numeric - 0.7) < 1e-6


def test_init_with_custom_model_xml(stub):
  """Init(model=MjModel(xml=...)) loads the supplied model instead of
  the task default (reference grpc_agent_util.cc InitAgent +
  LoadModelFromString). Observable over the wire: the override narrows
  ctrlrange to [-0.3, 0.3], and GetAction clips to it."""
  from mujoco_mpc_tpu.tasks import registry
  xml = registry.get_task("Cartpole").xml().replace(
      'ctrlrange="-1 1"', 'ctrlrange="-0.3 0.3"')
  stub.Init(agent_pb2.InitRequest(
      task_id="Cartpole", model=agent_pb2.MjModel(xml=xml)))
  stub.SetState(agent_pb2.SetStateRequest(
      state=agent_pb2.State(qpos=[0.0, 3.0])))
  stub.PlannerStep(agent_pb2.PlannerStepRequest())
  act = np.array(stub.GetAction(agent_pb2.GetActionRequest()).action)
  assert act.shape == (1,)
  assert np.all(np.abs(act) <= 0.3 + 1e-6)
  # restore the default model for any later module tests
  stub.Init(agent_pb2.InitRequest(task_id="Cartpole"))


def test_get_action_physics_averaging(stub):
  """averaging_duration > 0 with nominal_action unset rolls physics
  forward and averages the applied actions (grpc_agent_util.cc:166-197);
  nominal_action=True averages the policy without stepping."""
  stub.Reset(agent_pb2.ResetRequest())
  stub.SetState(agent_pb2.SetStateRequest(
      state=agent_pb2.State(qpos=[0.0, 2.4])))
  stub.PlannerStep(agent_pb2.PlannerStepRequest())
  rolled = np.array(stub.GetAction(agent_pb2.GetActionRequest(
      averaging_duration=0.05)).action)
  nominal = np.array(stub.GetAction(agent_pb2.GetActionRequest(
      averaging_duration=0.05, nominal_action=True)).action)
  assert rolled.shape == nominal.shape == (1,)
  assert np.all(np.isfinite(rolled)) and np.all(np.isfinite(nominal))
  assert np.all(np.abs(rolled) <= 1.0 + 1e-6)


def test_modes_and_trajectory(stub):
  modes = stub.GetAllModes(agent_pb2.GetAllModesRequest()).mode_names
  assert len(modes) >= 1
  mode = stub.GetMode(agent_pb2.GetModeRequest()).mode
  assert mode in list(modes)
  traj = stub.GetBestTrajectory(agent_pb2.GetBestTrajectoryRequest())
  assert traj.steps > 0
  assert len(traj.states) == traj.steps * 4  # cartpole nq+nv
