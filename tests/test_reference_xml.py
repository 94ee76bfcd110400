"""Reference task.xml interop smoke (VERDICT r4 missing #5 / next #7).

The MJCF `<custom><numeric>` / `<sensor><user>` conventions this repo
implements are the REFERENCE's conventions — so the reference's own
task.xml files must load through `put_model` and step stably. The
reference builds its runnable XMLs at CMake time by patching dm_control
suite models (mjpc/tasks/CMakeLists.txt:20-62: copy suite XML, apply the
in-tree .patch); this test reruns that exact pipeline into a temp dir at
session scope, then parametrizes over EVERY task*.xml in the reference
tree, reporting each as loaded-and-stepped or skipped WITH the reason
(menagerie / MuJoCo-source assets are not vendored in this environment).

500-step stability = all states finite and bounded from the model's
initial state (home keyframe when present).
"""

import glob
import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import model as M

REF_TASKS = "/root/reference/mjpc/tasks"

# reference CMakeLists.txt:20-62 — dm_control suite base per task dir
_DM_CONTROL_BASES = {
    "acrobot": "acrobot.xml",
    "cartpole": "cartpole.xml",
    "humanoid": "humanoid.xml",
    "particle": "point_mass.xml",
    "swimmer": "swimmer.xml",
    "walker": "walker.xml",
}


def _all_task_xmls():
  if not os.path.isdir(REF_TASKS):
    return []
  xmls = sorted(glob.glob(os.path.join(REF_TASKS, "**", "task*.xml"),
                          recursive=True))
  return [os.path.relpath(x, REF_TASKS) for x in xmls]


@pytest.fixture(scope="session")
def ref_tree(tmp_path_factory):
  """Reference tasks tree with the dm_control *_modified.xml models
  reconstructed by the reference's own copy+patch pipeline."""
  try:
    import dm_control.suite as suite
  except ImportError:
    pytest.skip("dm_control not available")
  root = tmp_path_factory.mktemp("ref_tasks")
  tree = os.path.join(root, "tasks")
  shutil.copytree(REF_TASKS, tree)
  suite_dir = os.path.dirname(suite.__file__)
  for taskdir, base in _DM_CONTROL_BASES.items():
    dst_dir = os.path.join(tree, taskdir)
    patch_name = ("humanoid.xml.patch" if taskdir == "humanoid"
                  else f"{taskdir}.xml.patch")
    patch_path = os.path.join(dst_dir, patch_name)
    if not os.path.isfile(patch_path):
      continue
    base_copy = os.path.join(dst_dir, f"{taskdir}.xml")
    shutil.copy(os.path.join(suite_dir, base), base_copy)
    out = os.path.join(dst_dir, f"{taskdir}_modified.xml")
    with open(patch_path, "rb") as pf:
      res = subprocess.run(["patch", "-o", out, base_copy], stdin=pf,
                           capture_output=True)
    if res.returncode != 0:
      raise RuntimeError(
          f"patch failed for {taskdir}: {res.stderr.decode()[:300]}")
  # the installed dm_control is newer than the commit the reference pins;
  # its point_mass.xml already carries the mocap goal body the patch was
  # written to introduce, so patch-with-fuzz leaves it duplicated against
  # task.xml's own goal body — drop the base copy (task.xml's wins)
  pm = os.path.join(tree, "particle", "particle_modified.xml")
  if os.path.isfile(pm):
    with open(pm) as f:
      txt = f.read()
    start = txt.find('<body name="goal"')
    if start >= 0:
      end = txt.index("</body>", start) + len("</body>")
      with open(pm, "w") as f:
        f.write(txt[:start] + txt[end:])
  return tree


@pytest.mark.parametrize("rel", _all_task_xmls())
def test_reference_task_xml_loads_and_steps(rel, ref_tree):
  """Each reference task.xml: compile with C MuJoCo, convert with
  put_model, and run 500 stable steps — or skip with the concrete
  reason (never silently)."""
  path = os.path.join(ref_tree, rel)
  try:
    mjm = mujoco.MjModel.from_xml_path(path)
  except Exception as e:
    msg = str(e).replace("\n", " ")
    assert ("Error opening file" in msg or "Resource not found" in msg
            or "could not open" in msg.lower()), msg
    pytest.skip(f"asset not vendored in this environment (menagerie/"
                f"MuJoCo-source mesh): {msg[:160]}")

  try:
    m = M.put_model(mjm)
  except ValueError as e:
    # loud engine refusal (unsupported pair/condim) is itself the
    # documented contract; record it as the skip reason
    pytest.skip(f"put_model refuses (loud downgrade policy): "
                f"{str(e)[:160]}")

  d = M.make_data(m)
  home = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_KEY, "home")
  if home >= 0:
    d = d.replace(qpos=jnp.asarray(mjm.key_qpos[home], d.qpos.dtype))
  step = jax.jit(lambda d: F.step(m, d))
  for _ in range(500):
    d = step(d)
  qpos = np.asarray(d.qpos)
  qvel = np.asarray(d.qvel)
  assert np.all(np.isfinite(qpos)), rel
  assert np.all(np.isfinite(qvel)), rel
  # bounded: nothing blew up or drifted to infinity
  assert np.max(np.abs(qpos)) < 1e3, (rel, np.max(np.abs(qpos)))
  assert np.max(np.abs(qvel)) < 1e3, (rel, np.max(np.abs(qvel)))


def test_loadable_subset_is_nonempty(ref_tree):
  """At minimum particle and cartpole must make it through put_model
  (VERDICT r4 #7 names them)."""
  for rel in ("particle/task.xml", "cartpole/task.xml"):
    mjm = mujoco.MjModel.from_xml_path(os.path.join(ref_tree, rel))
    assert M.put_model(mjm) is not None, rel
