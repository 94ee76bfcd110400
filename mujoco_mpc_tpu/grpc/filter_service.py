"""State-estimation gRPC service (reference: mjpc/grpc/filter_service.{h,cc}).

Serves filter.StateEstimation over grpcio, routing to the estimator
registry (GroundTruth / Kalman / Unscented / Batch). The estimator is
chosen by the `estimator` custom numeric of the model (reference GUI
order: 0 ground truth, 1 kalman, 2 unscented, 3 batch).
"""

from __future__ import annotations

import concurrent.futures as futures
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import filter_pb2  # noqa: E402

import grpc  # noqa: E402


class _XmlTask:
  """Minimal Task-like wrapper around a raw MJCF model (for estimators)."""

  def __init__(self, xml=None, mjb=None):
    import mujoco
    import jax.numpy as jnp
    from mujoco_mpc_tpu.costs import spec as spec_lib
    from mujoco_mpc_tpu.physics import model as model_lib
    if xml:
      self.mjm = mujoco.MjModel.from_xml_string(xml)
    elif mjb:
      import tempfile, os as _os
      with tempfile.NamedTemporaryFile(suffix=".mjb",
                                       delete=False) as f:
        f.write(mjb)
        path = f.name
      try:
        self.mjm = mujoco.MjModel.from_binary_path(path)
      finally:
        _os.unlink(path)
    else:
      raise ValueError("model xml or mjb required")
    self.model = model_lib.put_model(self.mjm)
    self.cost_spec = None
    self.residual_params = jnp.zeros(0)

  def config(self, name, default):
    from mujoco_mpc_tpu.costs.spec import get_number_or_default
    return get_number_or_default(self.mjm, name, default)

  @property
  def home_qpos(self):
    for k in range(self.mjm.nkey):
      if self.mjm.key(k).name == "home":
        return np.array(self.mjm.key_qpos[k])
    return None

  def make_data(self):
    import jax.numpy as jnp
    from mujoco_mpc_tpu.physics import model as model_lib
    d = model_lib.make_data(self.model)
    home = self.home_qpos
    if home is not None:
      d = d.replace(qpos=jnp.asarray(home, d.qpos.dtype))
    return d


class FilterServicer:

  def __init__(self):
    self.estimator = None

  def Init(self, request, context):
    xml = mjb = None
    if request.HasField("model"):
      xml = request.model.xml or None
      mjb = request.model.mjb or None
    task = _XmlTask(xml=xml, mjb=mjb)
    est_id = int(task.config("estimator", 1))
    if est_id == 0:
      from mujoco_mpc_tpu.estimators.base import GroundTruth
      self.estimator = GroundTruth(task)
    elif est_id == 2:
      from mujoco_mpc_tpu.estimators.unscented import Unscented
      self.estimator = Unscented(task)
    elif est_id == 3:
      from mujoco_mpc_tpu.estimators.batch import Batch
      self.estimator = Batch(task)
    else:
      from mujoco_mpc_tpu.estimators.kalman import Kalman
      self.estimator = Kalman(task)
    return filter_pb2.InitResponse()

  def Reset(self, request, context):
    self.estimator.reset()
    return filter_pb2.ResetResponse()

  def Update(self, request, context):
    self.estimator.update(np.array(request.ctrl), np.array(request.sensor))
    return filter_pb2.UpdateResponse()

  def State(self, request, context):
    if request.HasField("state") and request.state.state:
      self.estimator.set_state(np.array(request.state.state))
    state = self.estimator.state
    return filter_pb2.StateResponse(
        state=filter_pb2.State(
            state=state.tolist(),
            time=getattr(self.estimator, "time", 0.0)))

  def Covariance(self, request, context):
    cov = self.estimator.covariance
    resp = filter_pb2.CovarianceResponse()
    if cov is not None:
      resp.covariance.covariance.extend(cov.ravel().tolist())
      resp.covariance.dimension = cov.shape[0]
    return resp

  def Noise(self, request, context):
    est = self.estimator
    if request.HasField("noise") and (request.noise.process or
                                      request.noise.sensor):
      est.set_noise(
          process=np.array(request.noise.process)
          if request.noise.process else None,
          sensor=np.array(request.noise.sensor)
          if request.noise.sensor else None)
    resp = filter_pb2.NoiseResponse()
    if hasattr(est, "q_noise"):
      resp.noise.process.extend(np.asarray(est.q_noise).tolist())
      resp.noise.sensor.extend(np.asarray(est.r_noise).tolist())
    return resp


_RPCS = [
    ("Init", filter_pb2.InitRequest),
    ("Reset", filter_pb2.ResetRequest),
    ("Update", filter_pb2.UpdateRequest),
    ("State", filter_pb2.StateRequest),
    ("Covariance", filter_pb2.CovarianceRequest),
    ("Noise", filter_pb2.NoiseRequest),
]


def make_server(port: int = 0):
  servicer = FilterServicer()
  handlers = {
      name: grpc.unary_unary_rpc_method_handler(
          getattr(servicer, name),
          request_deserializer=req.FromString,
          response_serializer=lambda msg: msg.SerializeToString())
      for name, req in _RPCS
  }
  generic = grpc.method_handlers_generic_handler(
      "filter.StateEstimation", handlers)
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
  print(f"filter server listening on {port}", flush=True)
  server.wait_for_termination()


if __name__ == "__main__":
  main()
