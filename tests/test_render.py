"""Renderer: stencil splats, mass conservation, fixed recording scale,
and the headless interaction hook (SURVEY.md C14, §3.3-3.4)."""

import json

import numpy as np

from helpers import small_scene

from sph_tpu import render
from sph_tpu.state import init


def test_splat_conserves_mass_and_spreads():
    """The density splat deposits exactly total weight n_active for any
    radius (interior particles), and radius > 0 covers more pixels than the
    single-pixel splat (point-sprite parity, VERDICT r1 missing #3)."""
    scene = small_scene(dim=2, seed=80)
    state = init(scene)
    n = int(state.n_active())
    f0 = np.asarray(render.render_splat(state, scene, 200, 150, radius=0))
    f1 = np.asarray(render.render_splat(state, scene, 200, 150, radius=1))
    assert abs(f0.sum() - n) < 1e-3
    # radius-1 deposits the full cosine-bell stencil weight per particle
    assert f1.sum() > f0.sum() * 2
    assert (f1 > 0).sum() > (f0 > 0).sum()


def test_splat_drops_out_of_frame():
    """Particles outside the viewport vanish instead of piling up on edge
    pixels (the old clip behavior drew bright frame borders)."""
    scene = small_scene(dim=2, seed=81)
    state = init(scene)
    # render a viewport that covers none of the fluid
    sub = scene.replace(lo=(-500.0, -500.0), hi=(-100.0, -100.0))
    f = np.asarray(render.render_splat(state, sub, 64, 64, radius=1))
    assert f.sum() == 0


def test_sequence_scale_fixed_normalization():
    fields = [np.zeros((4, 4), np.float32) for _ in range(3)]
    fields[0][0, 0] = 1.0
    fields[2][1, 1] = 100.0
    top = render.sequence_scale(fields)
    a = render.colorize(fields[0], top=top)
    b = render.colorize(fields[0])  # per-frame autoscale
    # under the shared scale, the dim frame stays dim
    assert a[0, 0].max() < b[0, 0].max()


def test_interactor_appends_force_field(tmp_path):
    from sph_tpu.cli import _Interactor

    scene = small_scene(dim=2, seed=82)
    path = tmp_path / "cmds.jsonl"
    inter = _Interactor(str(path))
    # no file yet: no-op
    s2, changed = inter.poll(scene, 0)
    assert not changed and s2 is scene

    path.write_text(
        json.dumps(
            {"force_field": {"pos": [100.0, 100.0], "strength": 5e4,
                             "radius": 50.0, "duration_steps": 40}}
        )
        + "\n"
    )
    s2, changed = inter.poll(scene, 7)
    assert changed and len(s2.force_fields) == 1
    ff = s2.force_fields[0]
    assert ff.start_step == 7 and ff.stop_step == 47

    # appended pause/resume lines toggle the flag; already-read lines are
    # not re-consumed
    with path.open("a") as fh:
        fh.write(json.dumps({"pause": True}) + "\n")
    s3, changed = inter.poll(s2, 9)
    assert not changed and inter.paused and len(s3.force_fields) == 1
    with path.open("a") as fh:
        fh.write(json.dumps({"resume": True}) + "\n")
    inter.poll(s3, 9)
    assert not inter.paused


def test_cli_run_resident_fast_path(tmp_path):
    """`sph-tpu run --sort-every 4 --resident` (the fast pallas mode) runs
    end-to-end and audits violations (CLI plumbing for the flagship
    configuration the benches measure)."""
    import sph_tpu.cli as cli
    from sph_tpu.params import scene_to_json

    scene = small_scene(dim=2, seed=83)
    scene_path = tmp_path / "scene.json"
    scene_path.write_text(scene_to_json(scene))
    rc = cli.main([
        "run", str(scene_path), "--method", "pallas",
        "--sort-every", "4", "--resident",
        "--frames", "1", "--steps-per-frame", "8",
        "--out", str(tmp_path / "out"), "--quiet",
    ])
    assert rc == 0
    metrics = (tmp_path / "out" / "metrics.jsonl").read_text().strip()
    assert json.loads(metrics.splitlines()[-1])["step"] == 8


def test_render_depth_mode_3d():
    """mode="depth": near particles (large coordinate on the projection
    axis) splat brighter than far ones; 2D scenes are rejected."""
    import jax.numpy as jnp
    import pytest

    from sph_tpu import render
    from sph_tpu.state import init
    from tests.helpers import small_scene

    scene = small_scene(dim=3)
    state = init(scene)
    lo, hi = np.asarray(scene.lo), np.asarray(scene.hi)
    # two particles at the same (x, y) pixel, opposite ends of z
    x = np.asarray(state.x).copy()
    x[0] = [0.5 * (lo[0] + hi[0]), 0.5 * (lo[1] + hi[1]), hi[2] - 1e-3]
    x[1] = [0.25 * lo[0] + 0.75 * hi[0], 0.5 * (lo[1] + hi[1]), lo[2] + 1e-3]
    import dataclasses
    state = dataclasses.replace(state, x=jnp.asarray(x))
    f = np.asarray(render.render_splat(state, scene, 64, 64, "depth",
                                       axes=(0, 1), radius=0))
    assert f.sum() > 0
    # the near particle's pixel is brighter than the far particle's
    def px(p):
        u = (p[0] - lo[0]) / (hi[0] - lo[0]) * 63
        v = (p[1] - lo[1]) / (hi[1] - lo[1]) * 63
        return 63 - int(round(v)), int(round(u))
    assert f[px(x[0])] > f[px(x[1])]

    scene2 = small_scene(dim=2)
    with pytest.raises(ValueError):
        render.render_splat(init(scene2), scene2, 32, 32, "depth")
