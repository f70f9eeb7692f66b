"""External force fields — the headless drag interaction (SURVEY.md L5)."""

import numpy as np

from helpers import small_scene

from sph_tpu.params import ForceField, scene_from_json, scene_to_json
from sph_tpu.state import init
from sph_tpu.step import make_advance, make_step


def _field_scene(strength, start=0, stop=1 << 30):
    scene = small_scene(dim=2, seed=95, gravity=(0.0, 0.0),
                        boundary_mode="penalty")
    return scene.replace(
        force_fields=(
            ForceField(
                pos=(300.0, 200.0),
                strength=strength,
                radius=280.0,
                start_step=start,
                stop_step=stop,
            ),
        )
    )


def _com(state):
    act = np.asarray(state.active)
    return np.asarray(state.x)[act].mean(axis=0)


def test_attractor_pulls_fluid():
    scene = _field_scene(strength=5e4)
    state = init(scene)
    com0 = _com(state)
    adv = make_advance(scene, "grid", steps_per_dispatch=200)
    state = adv(state)
    com1 = _com(state)
    target = np.array([300.0, 200.0])
    assert np.linalg.norm(com1 - target) < np.linalg.norm(com0 - target)
    assert np.all(np.isfinite(np.asarray(state.x)))


def test_repulsor_pushes_fluid():
    scene = _field_scene(strength=-5e4)
    # place the field at the fluid's center of mass
    state = init(scene)
    com0 = _com(state)
    scene = scene.replace(
        force_fields=(
            ForceField(pos=tuple(com0), strength=-5e4, radius=280.0),
        )
    )
    adv = make_advance(scene, "grid", steps_per_dispatch=200)
    state = adv(init(scene))
    act = np.asarray(state.active)
    x = np.asarray(state.x)[act]
    spread1 = np.linalg.norm(x - com0[None, :], axis=1).mean()
    x0 = np.asarray(init(scene).x)[act]
    spread0 = np.linalg.norm(x0 - com0[None, :], axis=1).mean()
    assert spread1 > spread0  # blown outward


def test_schedule_window_honored():
    """A field that never activates leaves the trajectory bitwise identical
    to having no field at all."""
    scene_off = _field_scene(strength=5e4, start=10_000_000)
    scene_none = scene_off.replace(force_fields=())
    step_a = make_step(scene_off, "naive")
    step_b = make_step(scene_none, "naive")
    sa, sb = init(scene_off), init(scene_none)
    for _ in range(10):
        sa = step_a(sa)
        sb = step_b(sb)
    assert np.array_equal(np.asarray(sa.x), np.asarray(sb.x))


def test_force_field_json_roundtrip():
    scene = _field_scene(strength=123.0, start=5, stop=50)
    assert scene_from_json(scene_to_json(scene)) == scene


def test_vortex2d_demo_preset_stirs():
    """vortex2d (round-4 demo): the rotating ring of scheduled pushes
    injects net angular momentum about the stir center — the scripted
    analog of the reference's circular mouse drag — and the scene stays
    healthy.  Run at reduced scale (same construction, ~2.5k)."""
    import numpy as np

    from sph_tpu.params import _vortex_2d, calibrate, preset
    from sph_tpu.state import init
    from sph_tpu.step import run

    full = preset("vortex2d")
    assert len(full.force_fields) == 36
    assert int(init(full).n_active()) > 80_000  # "larger demo" for real
    # schedule covers 3 revolutions back-to-back
    starts = sorted(f.start_step for f in full.force_fields)
    assert starts[0] == 0 and starts[-1] == 3500

    sc = calibrate(_vortex_2d(2500))
    st = run(sc, 300, method="grid", steps_per_dispatch=100)
    x = np.asarray(st.x)[np.asarray(st.active)]
    v = np.asarray(st.v)[np.asarray(st.active)]
    assert np.isfinite(x).all() and np.isfinite(v).all()
    pos = np.array([f.pos for f in sc.force_fields])
    rel = x - pos.mean(axis=0)
    ang_mom = np.sum(rel[:, 0] * v[:, 1] - rel[:, 1] * v[:, 0])
    assert ang_mom > 1e3  # counterclockwise swirl, not noise
