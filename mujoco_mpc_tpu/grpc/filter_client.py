"""Python client for the filter service (reference python/mujoco_mpc/
filter.py parity: spawn server subprocess, wrap all RPCs)."""

from __future__ import annotations

import atexit
import os
import socket
import subprocess
import sys
from typing import Optional

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import filter_pb2  # noqa: E402

import grpc  # noqa: E402

_RPCS = ["Init", "Reset", "Update", "State", "Covariance", "Noise"]


class _Stub:

  def __init__(self, channel):
    for name in _RPCS:
      resp_cls = getattr(filter_pb2, f"{name}Response")
      setattr(self, name, channel.unary_unary(
          f"/filter.StateEstimation/{name}",
          request_serializer=lambda m: m.SerializeToString(),
          response_deserializer=resp_cls.FromString))


class Filter:
  """Drop-in equivalent of mujoco_mpc.filter.Filter."""

  def __init__(self, model_xml: str, server_addr: Optional[str] = None):
    self._proc = None
    if server_addr is None:
      with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
      server_py = os.path.join(os.path.dirname(__file__),
                               "filter_service.py")
      env = dict(os.environ)
      repo = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
      env["PYTHONPATH"] = (repo if not env.get("PYTHONPATH")
                           else env["PYTHONPATH"] + os.pathsep + repo)
      self._proc = subprocess.Popen(
          [sys.executable, server_py, "--mjpc_port", str(port)], env=env)
      atexit.register(self.close)
      server_addr = f"localhost:{port}"
    self.channel = grpc.insecure_channel(server_addr)
    grpc.channel_ready_future(self.channel).result(timeout=120)
    self.stub = _Stub(self.channel)
    self.stub.Init(filter_pb2.InitRequest(
        model=filter_pb2.MjModel(xml=model_xml)), timeout=300)

  def close(self):
    if self._proc is not None:
      self._proc.terminate()
      self._proc = None

  def init(self, model, send_as: str = "xml"):
    """Re-initialize with a mujoco.MjModel / xml string / mjb bytes
    (reference filter.py init:98-140)."""
    if isinstance(model, bytes):
      msg = filter_pb2.MjModel(mjb=model)
    elif isinstance(model, str):
      msg = filter_pb2.MjModel(xml=model)
    else:
      import mujoco
      if send_as == "mjb":
        buf = np.empty(mujoco.mj_sizeModel(model), dtype=np.uint8)
        mujoco.mj_saveModel(model, None, buf)
        msg = filter_pb2.MjModel(mjb=buf.tobytes())
      else:
        import pathlib
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".xml") as f:
          mujoco.mj_saveLastXML(f.name, model)
          msg = filter_pb2.MjModel(
              xml=pathlib.Path(f.name).read_text())
    self.stub.Init(filter_pb2.InitRequest(model=msg), timeout=300)

  def available_filters(self):
    """Estimator registry (reference filter.py available_filters)."""
    return {"ground truth", "extended Kalman filter",
            "unscented Kalman filter", "batch filter"}

  def reset(self):
    self.stub.Reset(filter_pb2.ResetRequest())

  def update(self, ctrl, sensor):
    self.stub.Update(filter_pb2.UpdateRequest(
        ctrl=np.asarray(ctrl).tolist(), sensor=np.asarray(sensor).tolist()))

  def state(self, state=None) -> np.ndarray:
    req = filter_pb2.StateRequest()
    if state is not None:
      req.state.state.extend(np.asarray(state).tolist())
    return np.array(self.stub.State(req).state.state)

  def covariance(self) -> np.ndarray:
    resp = self.stub.Covariance(filter_pb2.CovarianceRequest())
    n = resp.covariance.dimension
    return np.array(resp.covariance.covariance).reshape(n, n)

  def noise(self, process=None, sensor=None) -> dict:
    req = filter_pb2.NoiseRequest()
    if process is not None:
      req.noise.process.extend(np.asarray(process).tolist())
    if sensor is not None:
      req.noise.sensor.extend(np.asarray(sensor).tolist())
    resp = self.stub.Noise(req)
    return {"process": np.array(resp.noise.process),
            "sensor": np.array(resp.noise.sensor)}
