"""Deeper service coverage toward reference e2e parity (VERDICT r2 #8).

Reference models: python/mujoco_mpc/agent_test.py (437 LoC),
filter_test.py, direct_test.py — set/get roundtrips, mode walks,
mjb-bytes Init, SetAnything, Covariance/Noise, error paths.
In-process servers (agent_service_test.cc pattern) for determinism.
"""

import grpc
import numpy as np
import pytest

from mujoco_mpc_tpu.grpc import agent_pb2, direct_pb2, filter_pb2
from mujoco_mpc_tpu.grpc.agent_client import _Stub
from mujoco_mpc_tpu.grpc.agent_service import make_server as make_agent
from mujoco_mpc_tpu.grpc.direct_service import make_server as make_direct
from mujoco_mpc_tpu.grpc.filter_service import make_server as make_filter

_PEND_XML = """
<mujoco>
  <option timestep="0.005"/>
  <custom><numeric name="estimator" data="1"/></custom>
  <worldbody>
    <body>
      <joint name="j" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0 0 0.3" size="0.02" mass="0.1"/>
    </body>
  </worldbody>
  <sensor><jointpos joint="j"/><jointvel joint="j"/></sensor>
</mujoco>
"""


def _caller(port, service):
  ch = grpc.insecure_channel(f"localhost:{port}")

  def call(name, req, resp_cls):
    return ch.unary_unary(
        f"/{service}/{name}",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=resp_cls.FromString)(req)
  return call


@pytest.fixture(scope="module")
def agent_stub():
  server, servicer, port = make_agent()
  server.start()
  stub = _Stub(grpc.insecure_channel(f"localhost:{port}"))
  yield stub
  server.stop(0)


def test_set_anything_combined(agent_stub):
  """SetAnything applies state + weights + parameters + mode in one RPC
  (agent.proto SetAnythingRequest; reference grpc_agent_util)."""
  stub = agent_stub
  stub.Init(agent_pb2.InitRequest(task_id="Cartpole"))
  req = agent_pb2.SetAnythingRequest(
      state=agent_pb2.State(qpos=[0.3, 1.2]))
  req.cost_weights["Velocity"] = 0.25
  req.parameters["Goal"].numeric = 0.4
  stub.SetAnything(req)
  got = stub.GetState(agent_pb2.GetStateRequest()).state
  np.testing.assert_allclose(got.qpos, [0.3, 1.2], atol=1e-5)
  w = stub.GetCostValuesAndWeights(
      agent_pb2.GetCostValuesAndWeightsRequest())
  assert abs(w.values_weights["Velocity"].weight - 0.25) < 1e-6
  p = stub.GetTaskParameters(agent_pb2.GetTaskParametersRequest())
  assert abs(p.parameters["Goal"].numeric - 0.4) < 1e-6


def test_init_from_mjb_bytes(agent_stub):
  """Init(model=MjModel(mjb=...)) loads a compiled binary model
  (reference LoadModelFromBytes)."""
  import mujoco
  from mujoco_mpc_tpu.tasks import registry
  stub = agent_stub
  xml = registry.get_task("Cartpole").xml().replace(
      'ctrlrange="-1 1"', 'ctrlrange="-0.5 0.5"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  import tempfile, os
  with tempfile.NamedTemporaryFile(suffix=".mjb", delete=False) as f:
    mujoco.mj_saveModel(mjm, f.name)
    mjb = open(f.name, "rb").read()
  os.unlink(f.name)
  stub.Init(agent_pb2.InitRequest(
      task_id="Cartpole", model=agent_pb2.MjModel(mjb=mjb)))
  stub.SetState(agent_pb2.SetStateRequest(
      state=agent_pb2.State(qpos=[0.0, 3.0])))
  stub.PlannerStep(agent_pb2.PlannerStepRequest())
  act = np.array(stub.GetAction(agent_pb2.GetActionRequest()).action)
  assert np.all(np.abs(act) <= 0.5 + 1e-6)
  stub.Init(agent_pb2.InitRequest(task_id="Cartpole"))


def test_step_use_previous_policy(agent_stub):
  """Step(use_previous_policy=True) applies the PRE-update policy
  (reference previous_policy, sampling/planner.cc:525-534)."""
  stub = agent_stub
  stub.Init(agent_pb2.InitRequest(task_id="Cartpole"))
  stub.SetState(agent_pb2.SetStateRequest(
      state=agent_pb2.State(qpos=[0.0, 2.8])))
  stub.PlannerStep(agent_pb2.PlannerStepRequest())
  stub.PlannerStep(agent_pb2.PlannerStepRequest())
  t0 = stub.GetState(agent_pb2.GetStateRequest()).state.time
  stub.Step(agent_pb2.StepRequest(use_previous_policy=True))
  t1 = stub.GetState(agent_pb2.GetStateRequest()).state.time
  assert t1 > t0


def test_selection_parameter_roundtrip(agent_stub):
  """Selection task parameters set by option string and read back as the
  selection oneof (reference agent_test.py task-parameter walk)."""
  stub = agent_stub
  stub.Init(agent_pb2.InitRequest(task_id="Rubik"))
  req = agent_pb2.SetTaskParametersRequest()
  req.parameters["Scramble"].selection = "4"
  stub.SetTaskParameters(req)
  got = stub.GetTaskParameters(agent_pb2.GetTaskParametersRequest())
  assert got.parameters["Scramble"].selection == "4"
  stub.Init(agent_pb2.InitRequest(task_id="Cartpole"))


def test_mode_walk(agent_stub):
  """SetMode walks every advertised mode; GetMode reflects each
  (reference agent_test.py get_set_mode)."""
  stub = agent_stub
  stub.Init(agent_pb2.InitRequest(task_id="Rubik"))
  modes = stub.GetAllModes(agent_pb2.GetAllModesRequest()).mode_names
  assert list(modes) == ["Wait", "Manual", "Scramble", "Solve"]
  for mode in ["Manual", "Wait"]:
    stub.SetMode(agent_pb2.SetModeRequest(mode=mode))
    assert stub.GetMode(agent_pb2.GetModeRequest()).mode == mode
  stub.Init(agent_pb2.InitRequest(task_id="Cartpole"))


def test_agent_error_paths(agent_stub):
  stub = agent_stub
  stub.Init(agent_pb2.InitRequest(task_id="Cartpole"))
  with pytest.raises(grpc.RpcError):
    stub.SetCostWeights(agent_pb2.SetCostWeightsRequest(
        cost_weights={"NoSuchTerm": 1.0}))
  with pytest.raises(grpc.RpcError):
    stub.SetMode(agent_pb2.SetModeRequest(mode="NoSuchMode"))
  with pytest.raises(grpc.RpcError):
    req = agent_pb2.SetTaskParametersRequest()
    req.parameters["NoSuchParam"].numeric = 1.0
    stub.SetTaskParameters(req)


# ---------------------------------------------------------------------------
# filter service
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def filter_call():
  server, _, port = make_filter()
  server.start()
  yield _caller(port, "filter.StateEstimation")
  server.stop(0)


def test_filter_reset_restores_default_state(filter_call):
  call = filter_call
  call("Init", filter_pb2.InitRequest(
      model=filter_pb2.MjModel(xml=_PEND_XML)), filter_pb2.InitResponse)
  for _ in range(5):
    call("Update", filter_pb2.UpdateRequest(ctrl=[], sensor=[0.4, 0.0]),
         filter_pb2.UpdateResponse)
  moved = call("State", filter_pb2.StateRequest(),
               filter_pb2.StateResponse).state.state
  assert abs(moved[0]) > 1e-3
  call("Reset", filter_pb2.ResetRequest(), filter_pb2.ResetResponse)
  st = call("State", filter_pb2.StateRequest(),
            filter_pb2.StateResponse).state.state
  assert abs(st[0]) < 1e-6


def test_filter_set_state_roundtrip(filter_call):
  call = filter_call
  call("Init", filter_pb2.InitRequest(
      model=filter_pb2.MjModel(xml=_PEND_XML)), filter_pb2.InitResponse)
  st = call("State", filter_pb2.StateRequest(
      state=filter_pb2.State(state=[0.2, -0.1])),
      filter_pb2.StateResponse).state.state
  np.testing.assert_allclose(st, [0.2, -0.1], atol=1e-6)


def test_filter_covariance_converges_to_riccati_steady_state(filter_call):
  """Under repeated predict/correct the EKF covariance approaches the
  steady-state Riccati fixed point (reference kalman.cc update cycle):
  consecutive covariances converge and stay symmetric PSD."""
  call = filter_call
  call("Init", filter_pb2.InitRequest(
      model=filter_pb2.MjModel(xml=_PEND_XML)), filter_pb2.InitResponse)
  prev = None
  delta = None
  for i in range(30):
    call("Update", filter_pb2.UpdateRequest(ctrl=[], sensor=[0.0, 0.0]),
         filter_pb2.UpdateResponse)
    c = np.array(call(
        "Covariance", filter_pb2.CovarianceRequest(),
        filter_pb2.CovarianceResponse).covariance.covariance).reshape(2, 2)
    if prev is not None:
      delta = np.abs(c - prev).max()
    prev = c
  np.testing.assert_allclose(prev, prev.T, atol=1e-10)
  assert np.all(np.linalg.eigvalsh(prev) > 0)
  assert delta < 1e-6, delta  # converged


# ---------------------------------------------------------------------------
# direct service
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def direct_call():
  server, _, port = make_direct()
  server.start()
  yield _caller(port, "direct.Direct")
  server.stop(0)


def _fill_direct(call, t_hor=6):
  call("Init", direct_pb2.InitRequest(
      model=direct_pb2.MjModel(xml=_PEND_XML), configuration_length=t_hor),
      direct_pb2.InitResponse)
  rng = np.random.default_rng(1)
  for t in range(t_hor):
    q = 0.1 * t
    call("Data", direct_pb2.DataRequest(
        index=t, data=direct_pb2.Data(
            configuration=[q + 0.02 * rng.standard_normal()],
            sensor_measurement=[q])),
        direct_pb2.DataResponse)


def test_direct_data_readback_and_status(direct_call):
  call = direct_call
  _fill_direct(call)
  got = call("Data", direct_pb2.DataRequest(index=2),
             direct_pb2.DataResponse).data
  assert len(got.configuration) == 1
  call("Optimize", direct_pb2.OptimizeRequest(),
       direct_pb2.OptimizeResponse)
  status = call("Status", direct_pb2.StatusRequest(),
                direct_pb2.StatusResponse).status
  assert status.search_iterations >= 0
  assert status.solve_status in range(7)  # direct.h:36-45 statuses


def test_direct_settings_roundtrip(direct_call):
  call = direct_call
  _fill_direct(call)
  resp = call("Settings", direct_pb2.SettingsRequest(
      settings=direct_pb2.Settings(max_search_iterations=5)),
      direct_pb2.SettingsResponse)
  assert resp.settings.max_search_iterations == 5
  assert resp.settings.configuration_length == 6


def test_direct_noise_roundtrip(direct_call):
  call = direct_call
  _fill_direct(call)
  resp = call("Noise", direct_pb2.NoiseRequest(
      noise=direct_pb2.Noise(process=[2e-3], sensor=[0.5, 0.5])),
      direct_pb2.NoiseResponse)
  np.testing.assert_allclose(resp.noise.process, [2e-3])
  np.testing.assert_allclose(resp.noise.sensor, [0.5, 0.5])


def test_direct_bad_index_rejected(direct_call):
  call = direct_call
  _fill_direct(call)
  with pytest.raises(grpc.RpcError):
    call("Data", direct_pb2.DataRequest(index=99),
         direct_pb2.DataResponse)


def test_set_anything_named_mocap(agent_stub):
  """SetAnything's named per-body mocap map (reference
  grpc_agent_util.cc SetMocap:442-478): resolves body->mocapid, writes
  pose, rejects unknown/non-mocap bodies and bad sizes."""
  stub = agent_stub
  stub.Init(agent_pb2.InitRequest(task_id="Quadruped Flat"))
  req = agent_pb2.SetAnythingRequest()
  req.mocap["goal"].pos.extend([1.5, -0.5, 0.3])
  req.mocap["goal"].quat.extend([0.0, 0.0, 0.0, 1.0])
  stub.SetAnything(req)
  got = stub.GetState(agent_pb2.GetStateRequest()).state
  np.testing.assert_allclose(np.array(got.mocap_pos)[:3],
                             [1.5, -0.5, 0.3], atol=1e-6)
  np.testing.assert_allclose(np.array(got.mocap_quat)[:4],
                             [0.0, 0.0, 0.0, 1.0], atol=1e-6)
  # unknown body name -> error, nothing applied
  bad = agent_pb2.SetAnythingRequest()
  bad.mocap["nonexistent"].pos.extend([0, 0, 0])
  with pytest.raises(grpc.RpcError):
    stub.SetAnything(bad)
  # non-mocap body -> error
  bad2 = agent_pb2.SetAnythingRequest()
  bad2.mocap["trunk"].pos.extend([0, 0, 0])
  with pytest.raises(grpc.RpcError):
    stub.SetAnything(bad2)
  stub.Init(agent_pb2.InitRequest(task_id="Cartpole"))


def test_client_set_parameters_bundle():
  """Agent client applies an MjpcParameters bundle (mode + params +
  weights + named mocap) like the reference agent.py set_parameters."""
  from mujoco_mpc_tpu.grpc import mjpc_parameters
  from mujoco_mpc_tpu.grpc.agent_client import Agent as AgentClient
  import os
  os.environ.setdefault("MJPC_TPU_PLATFORM", "cpu")
  with AgentClient(task_id="Quadruped Flat") as agent:
    params = mjpc_parameters.MjpcParameters(
        mode="Walk",
        cost_weights={"Upright": 0.55},
        mocap={"goal": mjpc_parameters.Pose(
            pos=np.array([2.5, 0.0, 0.3]), quat=None)})
    agent.set_parameters(params)
    assert agent.get_mode() == "Walk"
    assert abs(agent.get_cost_weights()["Upright"] - 0.55) < 1e-6
    st = agent.get_state()
    np.testing.assert_allclose(np.array(st.mocap_pos)[:3],
                               [2.5, 0.0, 0.3], atol=1e-6)


def test_filter_direct_init_from_mjb():
  """Filter/Direct Init(model=MjModel(mjb=...)) loads compiled binaries
  (reference filter.py/direct.py init with send_as='mjb')."""
  import mujoco
  import tempfile, os as _os
  mjm = mujoco.MjModel.from_xml_string(_PEND_XML)
  with tempfile.NamedTemporaryFile(suffix=".mjb", delete=False) as f:
    mujoco.mj_saveModel(mjm, f.name)
    mjb = open(f.name, "rb").read()
  _os.unlink(f.name)

  server, _, port = make_filter()
  server.start()
  call = _caller(port, "filter.StateEstimation")
  call("Init", filter_pb2.InitRequest(model=filter_pb2.MjModel(mjb=mjb)),
       filter_pb2.InitResponse)
  call("Update", filter_pb2.UpdateRequest(ctrl=[], sensor=[0.1, 0.0]),
       filter_pb2.UpdateResponse)
  st = call("State", filter_pb2.StateRequest(), filter_pb2.StateResponse)
  assert len(st.state.state) == 2
  server.stop(0)

  server, _, port = make_direct()
  server.start()
  call = _caller(port, "direct.Direct")
  call("Init", direct_pb2.InitRequest(
      model=direct_pb2.MjModel(mjb=mjb), configuration_length=4),
      direct_pb2.InitResponse)
  info = call("SensorInfo", direct_pb2.SensorInfoRequest(),
              direct_pb2.SensorInfoResponse)
  assert info.dim_measurements == 2
  server.stop(0)
