"""Task registry (reference: mjpc/tasks/tasks.cc GetTasks)."""

from __future__ import annotations

from typing import Callable, Dict, Type


_REGISTRY: Dict[str, Callable] = {}


def register(cls):
  _REGISTRY[cls.name] = cls
  return cls


def get_task(name: str, **kwargs):
  _ensure_loaded()
  if name not in _REGISTRY:
    raise KeyError(
        f"unknown task {name!r}; available: {sorted(_REGISTRY)}")
  return _REGISTRY[name](**kwargs)


def task_names():
  _ensure_loaded()
  return sorted(_REGISTRY)


def _ensure_loaded():
  if _REGISTRY:
    return
  from mujoco_mpc_tpu.tasks import cartpole, particle, swimmer
  for mod, names in [
      (cartpole, ["Cartpole"]),
      (particle, ["Particle", "ParticleFixed"]),
      (swimmer, ["Swimmer"]),
  ]:
    for n in names:
      _REGISTRY[n] = getattr(mod, n)
  # optional tasks (present as the port grows)
  for modname, clsnames in [
      ("walker", ["Walker"]),
      ("quadruped", ["QuadrupedFlat", "QuadrupedHill"]),
      ("humanoid", ["HumanoidStand", "HumanoidWalk"]),
      ("tracking", ["HumanoidTracking"]),
      ("acrobot", ["Acrobot"]),
      ("pendulum", ["Pendulum"]),
      ("quadrotor", ["Quadrotor"]),
      ("hand", ["HandReorient"]),
      ("fingers", ["Fingers"]),
      ("manipulation", ["Manipulation"]),
      ("bimanual", ["BimanualHandover"]),
      ("aloha", ["BimanualInsert", "BimanualReorient"]),
      ("panda", ["Panda"]),
      ("op3", ["OP3"]),
      ("interact", ["HumanoidInteract"]),
      ("allegro", ["Allegro"]),
      ("rubik", ["Rubik", "CubeSolving"]),
  ]:
    try:
      mod = __import__(f"mujoco_mpc_tpu.tasks.{modname}",
                       fromlist=clsnames)
      for n in clsnames:
        if hasattr(mod, n):
          _REGISTRY[getattr(mod, n).name] = getattr(mod, n)
    except ImportError:
      pass
