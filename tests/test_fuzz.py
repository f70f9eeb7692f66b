"""Seeded fuzz: random scenes through all three neighbor paths — the paths
must agree with each other and stay finite (robustness net over the whole
config space, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sph_tpu import neighbors, pallas_step, physics
from sph_tpu.params import Block, Scene, SimParams, calibrate
from sph_tpu.state import init
from sph_tpu.step import make_step, prime


def _random_scene(rng):
    dim = int(rng.choice([2, 3]))
    h = float(rng.uniform(8.0, 24.0))
    extent = float(rng.uniform(8, 20)) * h
    lo = tuple(0.0 for _ in range(dim))
    hi = tuple(extent for _ in range(dim))
    b_lo = tuple(float(rng.uniform(h + 4, extent * 0.4)) for _ in range(dim))
    b_hi = tuple(
        float(min(b + rng.uniform(2 * h, extent * 0.5), extent - h - 4))
        for b in b_lo
    )
    p = SimParams(
        dim=dim,
        h=h,
        gravity=tuple([0.0] * (dim - 1) + [-float(rng.uniform(5, 400))]),
        dt=float(rng.uniform(1e-4, 6e-4)),
        viscosity=float(rng.uniform(50, 500)),
        eos=str(rng.choice(["ideal", "tait"])),
        integrator=str(rng.choice(["euler", "leapfrog"])),
        kernel_norm=str(rng.choice(["proper", "legacy3d"])),
        boundary_mode=str(rng.choice(["clamp", "penalty"])),
        wall_eps=h,
    )
    return calibrate(
        Scene(
            params=p,
            lo=lo,
            hi=hi,
            blocks=(Block(lo=b_lo, hi=b_hi),),
            seed=int(rng.integers(0, 1 << 16)),
        )
    )


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_random_scene_paths_agree_and_stay_finite(seed):
    rng = np.random.default_rng(seed)
    scene = _random_scene(rng)
    state = init(scene)
    if scene.params.integrator == "leapfrog":
        state = prime(scene, state, method="grid")

    grid = neighbors.GridSpec.for_scene(scene)
    x, v, act = state.x, state.v, state.active
    rho_n = physics.density_naive(x, act, scene.params)
    rho_g, p_g, f_g = neighbors.grid_rho_p_f(x, v, act, scene.params, grid)
    rho_p, p_p, f_p = pallas_step.pallas_rho_p_f(x, v, act, scene.params, grid)

    rho_n, rho_g, rho_p = map(np.asarray, (rho_n, rho_g, rho_p))
    assert np.allclose(rho_g, rho_n, rtol=1e-5), scene.params
    assert np.allclose(rho_p, rho_g, rtol=1e-5), scene.params
    fs = np.max(np.abs(np.asarray(f_g))) + 1e-9
    assert np.max(np.abs(np.asarray(f_p) - np.asarray(f_g))) / fs < 1e-4

    # a short trajectory stays finite on the grid path
    step = make_step(scene, "grid")
    for _ in range(20):
        state = step(state)
    assert np.all(np.isfinite(np.asarray(state.x)))
    assert np.all(np.isfinite(np.asarray(state.v)))


@pytest.mark.parametrize("seed", [515, 616])
def test_random_scene_resident_matches_classic_reuse(seed):
    """Fuzz the fast path: slot-resident block integration must stay
    bitwise-equal (x, rho; v to ulp) to the classic sort_every path on
    random scenes, with zero skin/cap violations."""
    from sph_tpu.step import make_advance

    rng = np.random.default_rng(seed)
    scene = _random_scene(rng)
    state = init(scene)
    if scene.params.integrator == "leapfrog":
        state = prime(scene, state, method="pallas")
    kw = dict(steps_per_dispatch=8, sort_every=4)
    s_a, viol_a = make_advance(scene, "pallas", **kw)(state)
    s_b, viol_b = make_advance(
        scene, "pallas", slot_resident=True, **kw
    )(state)
    assert int(viol_a) == 0 and int(viol_b) == 0, scene.params
    assert np.array_equal(np.asarray(s_a.x), np.asarray(s_b.x))
    assert np.array_equal(np.asarray(s_a.rho), np.asarray(s_b.rho))
    assert np.allclose(
        np.asarray(s_a.v), np.asarray(s_b.v), rtol=1e-5, atol=1e-5
    )
    assert np.all(np.isfinite(np.asarray(s_b.x)))


@pytest.mark.parametrize("seed", [919, 1020])
def test_random_scene_auto_policies_track_exact(seed):
    """Fuzz the round-3 auto-rebuild policy stack on random scenes: the
    membership-relaxed default, the strict knob, and minority repair must
    all report zero unhealed violations and track the per-step-rebuild
    trajectory to tolerance; membership must never rebuild more than
    strict (the lemma only removes rebuild triggers)."""
    from sph_tpu.step import make_advance

    rng = np.random.default_rng(seed)
    scene = _random_scene(rng)
    state = init(scene)
    if scene.params.integrator == "leapfrog":
        state = prime(scene, state, method="pallas")
    kw = dict(steps_per_dispatch=24, sort_every=4, slot_resident=True,
              auto_rebuild=True)
    mem = make_advance(scene, "pallas", **kw)(state)
    strict = make_advance(
        scene, "pallas", membership_audit=False, **kw
    )(state)
    rep = make_advance(scene, "pallas", repair_k=128, **kw)(state)
    exact = make_advance(scene, "pallas", steps_per_dispatch=24)(state)
    assert int(mem[1]) == 0 and int(strict[1]) == 0 and int(rep[1]) == 0
    assert int(mem[3]) <= int(strict[3]), scene.params
    xe = np.asarray(exact.x)
    act = np.asarray(exact.emit_step) <= int(exact.step)
    scale = np.max(np.abs(xe[act])) + 1e-9
    for out in (mem, strict, rep):
        xo = np.asarray(out[0].x)
        assert np.max(np.abs(xo[act] - xe[act])) / scale < 1e-4, scene.params
        assert np.all(np.isfinite(xo[act]))


@pytest.mark.parametrize("seed", [717, 818])
def test_random_scene_full_feature_matrix(seed):
    """Fuzz the feature COMBINATION the targeted tests cover one-at-a-time:
    static boundary particles + an emitter + a force field in one random
    scene — all three neighbor paths agree on the seeded state, and a short
    grid trajectory through emitter activations stays finite with shapes
    unchanged."""
    from sph_tpu.params import Emitter, ForceField

    rng = np.random.default_rng(seed)
    base = _random_scene(rng)
    p = base.params
    dim = p.dim
    ext = base.hi[0]
    s = p.h * 0.55
    floor = Block(
        lo=base.lo,
        hi=tuple(2 * s if a == dim - 1 else base.hi[a] for a in range(dim)),
        kind=1,
    )
    nozzle = tuple(
        ext * 0.75 if a == 0 else base.hi[a] * 0.8 for a in range(dim)
    )
    jet = tuple(0.0 if a != dim - 1 else -30.0 for a in range(dim))
    scene = calibrate(
        base.replace(
            blocks=base.blocks + (floor,),
            emitters=(
                Emitter(pos=nozzle, velocity=jet, width=2, start_step=3),
            ),
            force_fields=(
                ForceField(
                    pos=tuple(e * 0.5 for e in base.hi),
                    strength=float(rng.uniform(-3e4, 3e4)),
                    radius=3 * p.h,
                    start_step=0,
                ),
            ),
        )
    )
    state = init(scene)
    if p.integrator == "leapfrog":
        state = prime(scene, state, method="grid")

    grid = neighbors.GridSpec.for_scene(scene)
    x, v, act = state.x, state.v, state.active
    rho_n = physics.density_naive(x, act, p)
    rho_g, _, f_g = neighbors.grid_rho_p_f(x, v, act, p, grid)
    rho_p, _, f_p = pallas_step.pallas_rho_p_f(x, v, act, p, grid)
    assert np.allclose(np.asarray(rho_g), np.asarray(rho_n), rtol=1e-5)
    assert np.allclose(np.asarray(rho_p), np.asarray(rho_g), rtol=1e-5)
    fs = np.max(np.abs(np.asarray(f_g))) + 1e-9
    assert np.max(np.abs(np.asarray(f_p) - np.asarray(f_g))) / fs < 1e-4

    step = make_step(scene, "grid")
    shapes = jax.tree.map(lambda a: a.shape, state)
    for _ in range(12):
        state = step(state)
    assert jax.tree.map(lambda a: a.shape, state) == shapes
    assert np.all(np.isfinite(np.asarray(state.x)))
    # boundary particles never moved
    kind = np.asarray(state.kind)
    if (kind == 1).any():
        x0 = np.asarray(init(scene).x)
        assert np.array_equal(
            np.asarray(state.x)[kind == 1], x0[kind == 1]
        )


@pytest.mark.parametrize("seed", [919, 1020])
def test_random_scene_live_spawn_mid_run(seed):
    """Fuzz live injection against the production auto path: spawn random
    bursts between dispatches (the --interact flow) — the activation
    predicate must fold them in with zero unhealed violations, the active
    count must track init + spawned exactly, and the trajectory stays
    finite in-domain."""
    from sph_tpu.state import spawn
    from sph_tpu.step import make_advance

    rng = np.random.default_rng(seed)
    scene = _random_scene(rng)
    # headroom for injection: capacity beyond the seeded block
    scene = scene.replace(spawn_reserve=512)
    state = init(scene)
    if scene.params.integrator == "leapfrog":
        state = prime(scene, state, method="pallas")
    n0 = int(state.n_active())
    adv = make_advance(scene, "pallas", steps_per_dispatch=8,
                       sort_every=4, slot_resident=True, auto_rebuild=True)
    spawned = 0
    lo, hi = np.asarray(scene.lo), np.asarray(scene.hi)
    for burst in range(3):
        pos = lo + (0.25 + 0.5 * rng.random(scene.params.dim)) * (hi - lo)
        vel = rng.uniform(-20, 20, scene.params.dim)
        n = int(rng.integers(4, 64))
        state, k = spawn(state, scene, pos=pos, n=n, velocity=vel,
                         seed=burst)
        assert k > 0
        spawned += k
        out = adv(state)
        state, viol = out[0], out[1]
        assert int(viol) == 0, (seed, burst)
        assert int(state.n_active()) == n0 + spawned
    x = np.asarray(state.x)[np.asarray(state.active)]
    assert np.isfinite(x).all()
