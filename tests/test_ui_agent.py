"""UI-agent live-loop service test (reference ui_agent_test.py pattern)."""

import time

import grpc
import numpy as np
import pytest

from mujoco_mpc_tpu.grpc import agent_pb2
from mujoco_mpc_tpu.grpc.ui_agent_service import make_server


def test_ui_agent_live_loop():
  server, servicer, port = make_server()
  server.start()
  ch = grpc.insecure_channel(f"localhost:{port}")

  def call(name, req, resp_cls, timeout=300):
    return ch.unary_unary(
        f"/agent.Agent/{name}",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=resp_cls.FromString)(req, timeout=timeout)

  call("Init", agent_pb2.InitRequest(task_id="Cartpole",
                                     real_time_speed=10.0),
       agent_pb2.InitResponse)
  try:
    time.sleep(1.5)
    s1 = call("GetState", agent_pb2.GetStateRequest(),
              agent_pb2.GetStateResponse).state
    time.sleep(1.5)
    s2 = call("GetState", agent_pb2.GetStateRequest(),
              agent_pb2.GetStateResponse).state
    # live loop advances sim time without explicit Step RPCs
    assert s2.time > s1.time

    # mutating RPC runs on the physics thread (RunBeforeStep pattern)
    call("SetState", agent_pb2.SetStateRequest(
        state=agent_pb2.State(qpos=[0.25, 1.0])), agent_pb2.SetStateResponse)
    s3 = call("GetState", agent_pb2.GetStateRequest(),
              agent_pb2.GetStateResponse).state
    # state was applied (position then evolves from there)
    assert abs(s3.qpos[0] - 0.25) < 0.2
  finally:
    servicer.loop.stop()
    server.stop(0)
