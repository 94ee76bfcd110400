"""Python client for the direct service (reference python/mujoco_mpc/
direct.py parity)."""

from __future__ import annotations

import atexit
import os
import socket
import subprocess
import sys
from typing import Optional

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import direct_pb2  # noqa: E402

import grpc  # noqa: E402

_RPCS = ["Init", "Data", "Settings", "Cost", "Noise", "Reset", "Optimize",
         "Status", "SensorInfo"]


class _Stub:

  def __init__(self, channel):
    for name in _RPCS:
      resp_cls = getattr(direct_pb2, f"{name}Response")
      setattr(self, name, channel.unary_unary(
          f"/direct.Direct/{name}",
          request_serializer=lambda m: m.SerializeToString(),
          response_deserializer=resp_cls.FromString))


class Direct:
  """Drop-in equivalent of mujoco_mpc.direct.Direct."""

  def __init__(self, model_xml: str, configuration_length: int = 3,
               server_addr: Optional[str] = None):
    self._proc = None
    if server_addr is None:
      with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
      server_py = os.path.join(os.path.dirname(__file__),
                               "direct_service.py")
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
    self.stub.Init(direct_pb2.InitRequest(
        model=direct_pb2.MjModel(xml=model_xml),
        configuration_length=configuration_length), timeout=300)

  def close(self):
    if self._proc is not None:
      self._proc.terminate()
      self._proc = None

  def data(self, index: int, configuration=None, sensor_measurement=None,
           force_measurement=None) -> dict:
    data = direct_pb2.Data()
    if configuration is not None:
      data.configuration.extend(np.asarray(configuration).tolist())
    if sensor_measurement is not None:
      data.sensor_measurement.extend(
          np.asarray(sensor_measurement).tolist())
    if force_measurement is not None:
      data.force_measurement.extend(np.asarray(force_measurement).tolist())
    resp = self.stub.Data(direct_pb2.DataRequest(index=index, data=data))
    return {
        "configuration": np.array(resp.data.configuration),
        "sensor_measurement": np.array(resp.data.sensor_measurement),
        "force_measurement": np.array(resp.data.force_measurement),
    }

  def settings(self, **kwargs) -> dict:
    req = direct_pb2.SettingsRequest()
    for k, v in kwargs.items():
      setattr(req.settings, k, v)
    resp = self.stub.Settings(req)
    return {
        "configuration_length": resp.settings.configuration_length,
        "max_smoother_iterations": resp.settings.max_smoother_iterations,
    }

  def noise(self, process=None, sensor=None) -> dict:
    req = direct_pb2.NoiseRequest()
    if process is not None:
      req.noise.process.extend(np.asarray(process).tolist())
    if sensor is not None:
      req.noise.sensor.extend(np.asarray(sensor).tolist())
    resp = self.stub.Noise(req)
    return {"process": np.array(resp.noise.process),
            "sensor": np.array(resp.noise.sensor)}

  def optimize(self):
    self.stub.Optimize(direct_pb2.OptimizeRequest())

  def cost(self) -> dict:
    resp = self.stub.Cost(direct_pb2.CostRequest())
    return {"total": resp.total, "initial": resp.initial,
            "nvar": resp.nvar}

  def status(self) -> dict:
    resp = self.stub.Status(direct_pb2.StatusRequest())
    return {
        "solve_status": resp.status.solve_status,
        "smoother_iterations": resp.status.smoother_iterations,
        "cost_difference": resp.status.cost_difference,
    }

  def reset(self):
    self.stub.Reset(direct_pb2.ResetRequest())

  def sensor_info(self) -> dict:
    resp = self.stub.SensorInfo(direct_pb2.SensorInfoRequest())
    return {"start_index": resp.start_index,
            "num_measurements": resp.num_measurements,
            "dim_measurements": resp.dim_measurements}

  def init(self, model, configuration_length: int = 3,
           send_as: str = "xml"):
    """Re-initialize with a mujoco.MjModel / xml string / mjb bytes
    (reference direct.py init:100-145)."""
    if isinstance(model, bytes):
      msg = direct_pb2.MjModel(mjb=model)
    elif isinstance(model, str):
      msg = direct_pb2.MjModel(xml=model)
    else:
      import mujoco
      if send_as == "mjb":
        buf = np.empty(mujoco.mj_sizeModel(model), dtype=np.uint8)
        mujoco.mj_saveModel(model, None, buf)
        msg = direct_pb2.MjModel(mjb=buf.tobytes())
      else:
        import pathlib
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".xml") as f:
          mujoco.mj_saveLastXML(f.name, model)
          msg = direct_pb2.MjModel(xml=pathlib.Path(f.name).read_text())
    self.stub.Init(direct_pb2.InitRequest(
        model=msg, configuration_length=configuration_length),
        timeout=300)

  def measurements_from_sensordata(self, data) -> np.ndarray:
    """Slice a raw sensordata vector down to the measured segment
    (reference direct.py:429-436)."""
    info = self.sensor_info()
    i = info["start_index"]
    return np.asarray(data)[i:i + info["dim_measurements"]]

  def print_cost(self):
    c = self.cost()
    print("cost:")
    print("  [total]   = ", c["total"])
    print("  (initial  = ", c["initial"], ")")

  def print_status(self):
    s = self.status()
    print("status:")
    print("   smoother iterations = ", s["smoother_iterations"])
    print("   solve status        = ", s["solve_status"])
    print("   cost difference     = ", s["cost_difference"])
