"""Filter + Direct gRPC service tests (in-process, reference
agent_service_test.cc pattern)."""

import numpy as np
import pytest

import grpc

from mujoco_mpc_tpu.grpc import direct_pb2, filter_pb2
from mujoco_mpc_tpu.grpc.direct_service import make_server as make_direct
from mujoco_mpc_tpu.grpc.filter_service import make_server as make_filter

_XML = """
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


def _caller(channel, service):
  def call(name, req, resp_cls):
    return channel.unary_unary(
        f"/{service}/{name}",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=resp_cls.FromString)(req)
  return call


def test_filter_service_roundtrip():
  server, _, port = make_filter()
  server.start()
  call = _caller(grpc.insecure_channel(f"localhost:{port}"),
                 "filter.StateEstimation")
  call("Init", filter_pb2.InitRequest(
      model=filter_pb2.MjModel(xml=_XML)), filter_pb2.InitResponse)
  for t in range(5):
    call("Update", filter_pb2.UpdateRequest(ctrl=[], sensor=[0.3, 0.0]),
         filter_pb2.UpdateResponse)
  st = call("State", filter_pb2.StateRequest(), filter_pb2.StateResponse)
  assert len(st.state.state) == 2
  # filter pulls the estimate toward the measured angle
  assert abs(st.state.state[0] - 0.3) < 0.3
  cov = call("Covariance", filter_pb2.CovarianceRequest(),
             filter_pb2.CovarianceResponse)
  assert cov.covariance.dimension == 2
  noise = call("Noise", filter_pb2.NoiseRequest(
      noise=filter_pb2.Noise(process=[1e-3, 1e-3], sensor=[1e-2, 1e-2])),
      filter_pb2.NoiseResponse)
  np.testing.assert_allclose(noise.noise.process, [1e-3, 1e-3])
  server.stop(0)


def test_direct_service_optimizes():
  server, _, port = make_direct()
  server.start()
  call = _caller(grpc.insecure_channel(f"localhost:{port}"),
                 "direct.Direct")
  call("Init", direct_pb2.InitRequest(
      model=direct_pb2.MjModel(xml=_XML), configuration_length=6),
      direct_pb2.InitResponse)
  rng = np.random.default_rng(0)
  for t in range(6):
    q = 0.1 * t
    call("Data", direct_pb2.DataRequest(
        index=t, data=direct_pb2.Data(
            configuration=[q + 0.03 * rng.standard_normal()],
            sensor_measurement=[q])),
        direct_pb2.DataResponse)
  call("Optimize", direct_pb2.OptimizeRequest(), direct_pb2.OptimizeResponse)
  cost = call("Cost", direct_pb2.CostRequest(), direct_pb2.CostResponse)
  assert cost.total <= cost.initial
  info = call("SensorInfo", direct_pb2.SensorInfoRequest(),
              direct_pb2.SensorInfoResponse)
  assert info.num_measurements == 2
  server.stop(0)
