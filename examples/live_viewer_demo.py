"""Live browser viewer demo: watch, perturb, and tune a running agent.

Starts the UI-agent service (grpc/ui_agent_service.py) with the live
viewer attached (grpc/live_viewer.py) — the TPU-first stand-in for the
reference's interactive GLFW app (mjpc/simulate.cc): open the printed
URL to watch the physics run, pause/resume, change the real-time speed,
drag cost-weight sliders, switch modes, and nudge bodies, all mapped to
the same RPC surface the gRPC clients use.

  MJPC_TPU_PLATFORM=cpu PYTHONPATH=/root/repo \
      python examples/live_viewer_demo.py --task "Quadruped Flat"
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mujoco_mpc_tpu.grpc import serverenv

serverenv.apply()

from mujoco_mpc_tpu.grpc import agent_pb2
from mujoco_mpc_tpu.grpc.ui_agent_service import make_server


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--task", default="Cartpole")
  p.add_argument("--viewer_port", type=int, default=0)
  p.add_argument("--speed", type=float, default=1.0)
  args = p.parse_args()

  server, servicer, port = make_server(viewer_port=args.viewer_port)
  server.start()
  print(f"agent gRPC on localhost:{port}; initializing {args.task} "
        "(first compile may take a minute)...", flush=True)
  servicer.Init(agent_pb2.InitRequest(task_id=args.task,
                                      real_time_speed=args.speed), None)
  print(f"open {servicer.viewer.url()} in a browser "
        "(ctrl-c to stop)", flush=True)
  try:
    server.wait_for_termination()
  except KeyboardInterrupt:
    servicer.viewer.stop()
    servicer.loop.stop()
    server.stop(0)


if __name__ == "__main__":
  main()
