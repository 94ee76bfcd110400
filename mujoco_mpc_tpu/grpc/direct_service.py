"""Direct-optimizer gRPC service (reference: mjpc/grpc/direct_service.{h,cc}).

Serves direct.Direct over grpcio against the JAX batch Gauss-Newton
optimizer (mujoco_mpc_tpu.direct.optimizer).
"""

from __future__ import annotations

import concurrent.futures as futures
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import direct_pb2  # noqa: E402

import grpc  # noqa: E402


class DirectServicer:

  def __init__(self):
    self.direct = None
    self.task = None

  def Init(self, request, context):
    from mujoco_mpc_tpu.direct.optimizer import Direct
    from mujoco_mpc_tpu.grpc.filter_service import _XmlTask
    xml = mjb = None
    if request.HasField("model"):
      xml = request.model.xml or None
      mjb = request.model.mjb or None
    self.task = _XmlTask(xml=xml, mjb=mjb)
    horizon = request.configuration_length or 3
    self.direct = Direct(self.task, horizon)
    return direct_pb2.InitResponse()

  def Data(self, request, context):
    d = self.direct
    t = request.index
    nq, nv, ns = d.m.nq, d.m.nv, d.ns
    inp = request.data
    if inp.configuration:
      d.set_data(t, qpos=np.array(inp.configuration))
    if inp.sensor_measurement:
      d.set_data(t, sensor=np.array(inp.sensor_measurement))
    if inp.force_measurement:
      d.set_data(t, force=np.array(inp.force_measurement))
    out = direct_pb2.Data(
        configuration=(d.qpos_optimized[t].tolist()
                       if hasattr(d, "qpos_optimized")
                       else d.qpos_initial[t].tolist()),
        configuration_previous=d.qpos_initial[t].tolist(),
        sensor_measurement=d.sensor_measured[t].tolist(),
        force_measurement=d.force_measured[t].tolist(),
    )
    return direct_pb2.DataResponse(data=out)

  def Settings(self, request, context):
    if request.HasField("settings"):
      s = request.settings
      kw = {}
      if s.HasField("max_smoother_iterations"):
        kw["max_iterations"] = s.max_smoother_iterations
      if s.HasField("max_search_iterations"):
        kw["ls_iterations"] = s.max_search_iterations
      if s.HasField("gradient_tolerance"):
        kw["gradient_tolerance"] = s.gradient_tolerance
      if s.HasField("cost_tolerance"):
        kw["cost_tolerance"] = s.cost_tolerance
      if kw:
        import jax
        self.direct.settings = self.direct.settings.replace(**kw)
        self.direct._solve = jax.jit(
            self.direct._make_solve_banded() if self.direct.banded
            else self.direct._make_solve())
    resp = direct_pb2.SettingsResponse()
    resp.settings.configuration_length = self.direct.horizon
    resp.settings.max_smoother_iterations = \
        self.direct.settings.max_iterations
    resp.settings.max_search_iterations = \
        self.direct.settings.ls_iterations
    resp.settings.gradient_tolerance = \
        self.direct.settings.gradient_tolerance
    resp.settings.cost_tolerance = self.direct.settings.cost_tolerance
    return resp

  def Cost(self, request, context):
    d = self.direct
    resp = direct_pb2.CostResponse()
    resp.total = getattr(d, "cost", 0.0)
    resp.initial = getattr(d, "cost_initial", 0.0)
    resp.nvar = d.nvar
    resp.nsensor = d.ns * max(d.horizon - 2, 0)
    resp.nforce = d.m.nv * max(d.horizon - 2, 0)
    return resp

  def Noise(self, request, context):
    d = self.direct
    if request.HasField("noise"):
      if request.noise.sensor:
        d.set_weights(sensor=1.0 / np.maximum(
            np.array(request.noise.sensor), 1e-12))
      if request.noise.process:
        d.set_weights(force=1.0 / np.maximum(
            np.array(request.noise.process)[:d.m.nv], 1e-12))
    resp = direct_pb2.NoiseResponse()
    resp.noise.sensor.extend((1.0 / np.maximum(
        d.weight_sensor, 1e-12)).tolist())
    resp.noise.process.extend((1.0 / np.maximum(
        d.weight_force, 1e-12)).tolist())
    return resp

  def Reset(self, request, context):
    d = self.direct
    d.sensor_measured[:] = 0
    d.force_measured[:] = 0
    d.qpos_initial[:] = np.asarray(d._template.qpos)
    if hasattr(d, "qpos_optimized"):
      del d.qpos_optimized
    return direct_pb2.ResetResponse()

  def Optimize(self, request, context):
    self.direct.optimize()
    return direct_pb2.OptimizeResponse()

  def Status(self, request, context):
    d = self.direct
    resp = direct_pb2.StatusResponse()
    resp.status.smoother_iterations = getattr(d, "iterations", 0)
    resp.status.solve_status = int(getattr(d, "status", 0))
    resp.status.cost_difference = (getattr(d, "cost_initial", 0.0) -
                                   getattr(d, "cost", 0.0))
    return resp

  def SensorInfo(self, request, context):
    d = self.direct
    return direct_pb2.SensorInfoResponse(
        start_index=0, num_measurements=d.ns, dim_measurements=d.ns)


_RPCS = [
    ("Init", direct_pb2.InitRequest),
    ("Data", direct_pb2.DataRequest),
    ("Settings", direct_pb2.SettingsRequest),
    ("Cost", direct_pb2.CostRequest),
    ("Noise", direct_pb2.NoiseRequest),
    ("Reset", direct_pb2.ResetRequest),
    ("Optimize", direct_pb2.OptimizeRequest),
    ("Status", direct_pb2.StatusRequest),
    ("SensorInfo", direct_pb2.SensorInfoRequest),
]


def make_server(port: int = 0):
  servicer = DirectServicer()
  handlers = {
      name: grpc.unary_unary_rpc_method_handler(
          getattr(servicer, name),
          request_deserializer=req.FromString,
          response_serializer=lambda msg: msg.SerializeToString())
      for name, req in _RPCS
  }
  generic = grpc.method_handlers_generic_handler("direct.Direct", handlers)
  server = grpc.server(futures.ThreadPoolExecutor(max_workers=2))
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
  print(f"direct server listening on {port}", flush=True)
  server.wait_for_termination()


if __name__ == "__main__":
  main()
