"""UI-agent service: the agent gRPC API served from a LIVE plan/act loop.

Reference capability: mjpc/grpc/ui_agent_service.{h,cc} — the same
agent.proto served from the running GUI app, where each RPC is enqueued as
a RunBeforeStep job executed on the physics thread (ui_agent_service.cc:
72-120). Here the "app" is a headless background loop: a physics thread
steps the environment in (scaled) real time while a planner thread keeps
optimizing; RPCs post jobs to the physics thread's queue and wait.
"""

from __future__ import annotations

import concurrent.futures as futures
import queue
import threading
import time
from typing import Callable

import grpc
import numpy as np

from mujoco_mpc_tpu.grpc import agent_pb2
from mujoco_mpc_tpu.grpc.agent_service import _RPCS, AgentServicer


class LiveLoop:
  """Headless physics + planner loop (reference app.cc PhysicsLoop role)."""

  def __init__(self, agent, real_time_speed: float = 1.0,
               steps_per_plan: int = 4):
    self.agent = agent
    self.real_time_speed = real_time_speed
    self.steps_per_plan = steps_per_plan
    # paused: stop stepping/planning but keep draining RPC/viewer jobs
    # (reference simulate.cc run/pause toggle)
    self.paused = False
    self._jobs: "queue.Queue[tuple[Callable, threading.Event, list]]" = \
        queue.Queue()
    self._stop = threading.Event()
    self.step_count = 0
    self._step_cv = threading.Condition()
    # single worker thread interleaves planning and stepping: the jax
    # backend here cannot execute two jitted programs concurrently from
    # different Python threads (and a single TPU serializes programs
    # anyway); RPCs stay non-blocking via the job queue, and real-time
    # action sampling during planning is the native runtime's job
    # (runtime/policy_runtime.cc)
    self._physics = threading.Thread(target=self._physics_loop, daemon=True)
    self._physics.start()

  def run_before_step(self, fn: Callable, timeout: float = 60.0):
    """Execute fn on the physics thread before its next step
    (reference RunBeforeStep pattern, agent.cc:331-351)."""
    done = threading.Event()
    out: list = [None, None]
    self._jobs.put((fn, done, out))
    if not done.wait(timeout):
      raise TimeoutError("physics thread did not run the job")
    if out[1] is not None:
      raise out[1]
    return out[0]

  def _physics_loop(self):
    dt = float(self.agent.m.opt.timestep)
    n = 0
    while not self._stop.is_set():
      t0 = time.perf_counter()
      # drain pending jobs FIRST so RPCs are never starved by planning
      while True:
        try:
          fn, done, out = self._jobs.get_nowait()
        except queue.Empty:
          break
        try:
          out[0] = fn()
        except Exception as e:  # surface to the RPC thread
          out[1] = e
        done.set()
      if self._stop.is_set():
        break
      if self.paused:
        time.sleep(0.01)
        continue
      if n % self.steps_per_plan == 0:
        try:
          self.agent.plan_iteration()
        except Exception:
          pass
      n += 1
      try:
        self.agent.step_env()
        with self._step_cv:
          self.step_count += 1
          self._step_cv.notify_all()
      except Exception as e:  # keep the loop alive; report once
        if not getattr(self, "_step_error", None):
          self._step_error = e
          import traceback
          traceback.print_exc()
        time.sleep(0.1)
      # real-time pacing
      elapsed = time.perf_counter() - t0
      budget = dt / max(self.real_time_speed, 1e-6)
      if elapsed < budget:
        time.sleep(budget - elapsed)

  def wait_for_step(self, timeout: float = 60.0):
    """Block until the live loop completes at least one more physics
    step. Gives Step RPC clients a real synchronization barrier: after
    Step returns, GetState observes a strictly advanced state."""
    with self._step_cv:
      target = self.step_count + 1
      ok = self._step_cv.wait_for(lambda: self.step_count >= target,
                                  timeout)
    if not ok:
      raise TimeoutError("physics loop did not advance")

  def stop(self):
    """Stop and JOIN the physics thread. The loop re-checks the stop
    flag between jobs/planning/stepping, so the join bound only needs
    to cover one in-flight plan or step (can be seconds on a cold
    compile); a still-alive thread after that is a real wedge."""
    self._stop.set()
    self._physics.join(timeout=60)


class UiAgentServicer(AgentServicer):
  """AgentServicer whose RPCs ALL run on the live worker thread.

  Any device access (even an array read) from a second Python thread can
  deadlock against an executing program on this backend, so every RPC is
  enqueued as a RunBeforeStep job — exactly the reference's
  ui_agent_service synchronization model (ui_agent_service.cc:72-120).
  """

  def __init__(self, viewer_port=None):
    super().__init__()
    self.loop = None
    self.viewer = None
    # viewer_port is not None -> start the live browser viewer
    # (grpc/live_viewer.py) once an agent exists; 0 picks a free port
    self.viewer_port = viewer_port

  def Init(self, request, context):
    resp = super().Init(request, context)
    speed = request.real_time_speed or 1.0
    # warm up compilation before the real-time loop starts
    self.agent.plan_iteration()
    self.agent.step_env()
    self.agent.reset()
    self.loop = LiveLoop(self.agent, real_time_speed=speed)
    if self.viewer_port is not None and self.viewer is None:
      from mujoco_mpc_tpu.grpc.live_viewer import LiveViewer
      self.viewer = LiveViewer(self, port=self.viewer_port)
      print(f"live viewer at {self.viewer.url()}", flush=True)
    return resp

  def on_physics(self, fn):
    if self.loop is None:
      return fn()
    return self.loop.run_before_step(fn)

  def Step(self, request, context):
    # the live loop steps continuously (reference ui_agent_service.cc:166-171
    # is a pure no-op); here Step additionally BLOCKS until the loop
    # completes one more physics step, so lockstep clients that call
    # step() observe an advanced state instead of silently free-running
    if self.loop is not None:
      self.loop.wait_for_step()
    return agent_pb2.StepResponse()


def make_server(port: int = 0, viewer_port=None):
  servicer = UiAgentServicer(viewer_port=viewer_port)

  def dispatch(name):
    method = getattr(servicer, name)
    def handler(request, context):
      if name in ("Init", "Step"):
        return method(request, context)
      return servicer.on_physics(lambda: method(request, context))
    return handler

  handlers = {
      name: grpc.unary_unary_rpc_method_handler(
          dispatch(name),
          request_deserializer=req.FromString,
          response_serializer=lambda msg: msg.SerializeToString())
      for name, req, resp in _RPCS
  }
  generic = grpc.method_handlers_generic_handler("agent.Agent", handlers)
  server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
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
  p.add_argument("--viewer_port", type=int, default=None,
                 help="start the live browser viewer on this port "
                      "(0 = pick a free port)")
  args = p.parse_args()
  server, _, port = make_server(args.mjpc_port,
                                viewer_port=args.viewer_port)
  server.start()
  print(f"ui agent server listening on {port}", flush=True)
  server.wait_for_termination()


if __name__ == "__main__":
  main()
