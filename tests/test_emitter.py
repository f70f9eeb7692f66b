"""Emitters / activation masking (SURVEY.md §4.8): activating masked
particles mid-scan neither perturbs existing particles nor changes shapes."""

import numpy as np

from sph_tpu.params import Block, Emitter, Scene, SimParams, calibrate
from sph_tpu.state import INACTIVE, init
from sph_tpu.step import make_advance, make_step


def _emitter_scene(with_block=True, width=2, start=10, stop=1 << 30, speed=30.0):
    p = SimParams(boundary_mode="penalty", gravity=(0.0, -9.81))
    blocks = (
        (Block(lo=(30.0, 30.0), hi=(120.0, 160.0)),) if with_block else ()
    )
    return calibrate(
        Scene(
            params=p,
            lo=(0.0, 0.0),
            hi=(400.0, 400.0),
            blocks=blocks,
            emitters=(
                Emitter(
                    pos=(300.0, 300.0),
                    velocity=(0.0, -speed),
                    width=width,
                    start_step=start,
                    stop_step=stop,
                ),
            ),
            capacity=1024,
            seed=40,
        )
    )


def test_activation_schedule():
    scene = _emitter_scene(width=2, start=10)
    state = init(scene)
    n0 = int(state.n_active())
    step = make_step(scene, "naive")
    for _ in range(9):
        state = step(state)
    assert int(state.n_active()) == n0  # nothing before start_step
    for _ in range(10):
        state = step(state)
    n1 = int(state.n_active())
    assert n1 == n0 + 2  # the first nozzle row (width=2) fired at step 10
    k = int(state.step)
    assert n1 == int(np.sum(np.asarray(state.emit_step) <= k))


def test_emission_interval_physical():
    """Consecutive emission rows are spaced so the jet streams `spacing`
    apart: interval = spacing / (|v| dt) steps."""
    scene = _emitter_scene(with_block=False, start=0, speed=30.0)
    spacing = scene.params.h * 0.55
    interval = max(1, round(spacing / (30.0 * scene.params.dt)))
    state = init(scene)
    emit = np.asarray(state.emit_step)
    sched = np.unique(emit[emit != INACTIVE])
    assert sched[0] == 0
    if len(sched) > 1:
        assert sched[1] - sched[0] == interval


def test_shapes_never_change():
    scene = _emitter_scene()
    state = init(scene)
    cap = state.capacity
    adv = make_advance(scene, "naive", steps_per_dispatch=30)
    state = adv(state)
    assert state.capacity == cap
    assert state.x.shape == (cap, 2)


def test_pending_emitter_slots_do_not_perturb():
    """A scene with an emitter that never fires matches the same scene with
    no emitter, bitwise, for the seeded block particles."""
    s_with = _emitter_scene(start=10_000_000)
    s_without = s_with.replace(emitters=())
    st_w = init(s_with)
    st_o = init(s_without)
    n_seed = int(st_o.n_active())
    step_w = make_step(s_with, "naive")
    step_o = make_step(s_without, "naive")
    for _ in range(20):
        st_w = step_w(st_w)
        st_o = step_o(st_o)
    xw = np.asarray(st_w.x)[:n_seed]
    xo = np.asarray(st_o.x)[:n_seed]
    assert np.array_equal(xw, xo)
    # pending slots stayed exactly at their precomputed spawn states
    pend = np.asarray(st_w.emit_step) > 20
    pend &= np.asarray(st_w.emit_step) != INACTIVE
    assert np.array_equal(
        np.asarray(st_w.x)[pend], np.asarray(init(s_with).x)[pend]
    )


def test_emitted_particles_fall():
    """The first nozzle row, emitted into empty space, jets downward and
    stays finite (no spawn-overlap explosion)."""
    scene = _emitter_scene(with_block=False, width=2, start=0, speed=30.0)
    state = init(scene)
    adv = make_advance(scene, "naive", steps_per_dispatch=100)
    state = adv(state)
    act = np.asarray(state.active)
    assert act.sum() >= 2
    v = np.asarray(state.v)[act]
    x = np.asarray(state.x)[act]
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(v))
    assert np.all(v[:, 1] < 0)  # jet + gravity: moving down


def test_stop_step_honored():
    scene = _emitter_scene(with_block=False, width=2, start=5, stop=25)
    state = init(scene)
    emit = np.asarray(state.emit_step)
    scheduled = emit[(emit >= 0) & (emit != INACTIVE)]
    assert scheduled.min() == 5
    assert scheduled.max() < 25


def test_emitter_under_resident_fast_path():
    """Emitters on the slot-resident reuse path: activations freeze until
    the next rebuild (≤ sort_every steps late), then join pair physics —
    nothing is lost, shapes never change, and by any rebuild boundary the
    active set equals the schedule's."""
    scene = _emitter_scene(with_block=False, start=2, speed=30.0)
    state = init(scene)
    adv = make_advance(scene, "pallas", steps_per_dispatch=4,
                       sort_every=4, slot_resident=True)
    emit = np.asarray(state.emit_step)
    for _ in range(6):   # 24 steps in 4-step blocks
        state, viol = adv(state)
        assert int(viol) == 0
        step = int(state.step)
        # block boundary: the activation mask must exactly match schedule
        active = np.asarray(state.active)
        assert np.array_equal(active, emit <= step)
    x = np.asarray(state.x)[np.asarray(state.active)]
    assert np.isfinite(x).all()
    # emitted particles moved off the nozzle (they integrate after joining)
    assert (x[:, 1] < 300.0 - 1e-3).all()


def test_fountain2d_demo_preset():
    """The fountain2d demo preset (pool + 3 staggered jets) constructs,
    runs finite on the flagship auto path, and actually emits."""
    from sph_tpu.params import preset
    from sph_tpu.step import make_audited_advance

    scene = preset("fountain2d")
    state = init(scene)
    n0 = int(state.n_active())
    adv = make_audited_advance(scene, "pallas", steps_per_dispatch=100,
                               sort_every=4, slot_resident=True)
    for _ in range(5):
        state = adv(state)
    assert int(state.step) == 500
    assert int(state.n_active()) > n0  # the fountain fired
    x = np.asarray(state.x)[np.asarray(state.active)]
    assert np.isfinite(x).all()
    assert (x >= np.asarray(scene.lo) - 1e-3).all()
    assert (x <= np.asarray(scene.hi) + 1e-3).all()
