"""Diagnostics, watchdog fault injection, checkpoint/resume, renderer
(SURVEY.md §4 aux-subsystem coverage for §5.3-5.5 and C14)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import small_scene

from sph_tpu import diagnostics, render
from sph_tpu.params import Scene, SimParams
from sph_tpu.state import init
from sph_tpu.step import make_advance


def test_scalar_pack_sane():
    scene = small_scene(dim=2)
    state = init(scene)
    s = diagnostics.scalars_dict(
        diagnostics.scalar_pack(state, scene.params)
    )
    assert s["n_active"] == int(state.n_active())
    assert s["max_speed"] == 0.0
    assert 0.5 < s["mean_rho"] / scene.params.rest_density < 1.5
    assert np.isfinite(s["kinetic_energy"])


def test_watchdog_detects_injected_nan_within_one_frame():
    scene = small_scene(dim=2)
    state = init(scene)
    adv = make_advance(scene, "naive", steps_per_dispatch=5)
    state = adv(state)  # healthy
    wd = diagnostics.Watchdog(scene.params)
    wd.check(diagnostics.scalar_pack(state, scene.params))  # passes
    state = diagnostics.inject_nan(state, k=3)
    state = adv(state)  # fault propagates within the frame
    with pytest.raises(diagnostics.SimulationDiverged):
        wd.check(diagnostics.scalar_pack(state, scene.params))


def test_watchdog_tolerates_empty_frame():
    """A legitimately empty frame (emitters that start later) yields
    min_rho=+inf / max_rho=-inf from the masked reductions; the watchdog
    must not abort on it (ADVICE r1)."""
    from sph_tpu.params import Emitter, Scene, SimParams, calibrate

    scene = calibrate(
        Scene(
            params=SimParams(),
            blocks=(),
            emitters=(
                Emitter(
                    pos=(400.0, 500.0), velocity=(0.0, -50.0), start_step=50
                ),
            ),
            capacity=256,
        )
    )
    state = init(scene)
    assert int(state.n_active()) == 0
    wd = diagnostics.Watchdog(scene.params)
    s = wd.check(diagnostics.scalar_pack(state, scene.params))
    assert s["n_active"] == 0


def test_checkpoint_resume_bitwise(tmp_path):
    scene = small_scene(dim=2, seed=50)
    adv = make_advance(scene, "naive", steps_per_dispatch=20)
    state = adv(init(scene))
    path = str(tmp_path / "ckpt.npz")
    diagnostics.save_checkpoint(path, state, scene)
    state2, scene2 = diagnostics.load_checkpoint(path)
    assert scene2 == scene  # full config round-trip
    # resume both and require bitwise-identical trajectories
    a = adv(state)
    b = adv(state2)
    assert np.array_equal(np.asarray(a.x), np.asarray(b.x))
    assert np.array_equal(np.asarray(a.v), np.asarray(b.v))
    assert int(a.step) == int(b.step) == 40


def test_cfl_limit():
    scene = small_scene(dim=2)
    p = scene.params
    assert diagnostics.cfl_limit(p, 0.0) is None
    lim = diagnostics.cfl_limit(p, 100.0)
    assert abs(lim - 0.4 * p.h / 100.0) < 1e-9


def test_render_and_png(tmp_path):
    scene = small_scene(dim=2)
    state = init(scene)
    field = np.asarray(
        render.render_splat(state, scene, 200, 150, radius=0)
    )
    assert field.shape == (150, 200)
    assert field.sum() == int(state.n_active())  # every particle splatted
    # particles start in the lower-left block: mass should sit left+bottom
    assert field[:, :100].sum() > field[:, 100:].sum()
    assert field[75:, :].sum() > field[:75, :].sum()
    path = str(tmp_path / "f.png")
    render.save_frame(state, scene, path, width=200, height=150)
    with open(path, "rb") as fh:
        magic = fh.read(8)
    assert magic == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(path) > 100


def test_render_3d_projection():
    scene = small_scene(dim=3)
    state = init(scene)
    field = np.asarray(
        render.render_splat(state, scene, 100, 100, axes=(0, 1), radius=0)
    )
    assert field.sum() == int(state.n_active())


def test_cli_record_smoke(tmp_path):
    from sph_tpu import cli

    out = str(tmp_path / "movie.apng")
    rc = cli.main(
        [
            "record",
            "tutorial2d",
            "--method",
            "naive",
            "--frames",
            "3",
            "--steps-per-frame",
            "5",
            "--out",
            out,
            "--width",
            "120",
            "--height",
            "90",
            "--quiet",
        ]
    )
    assert rc == 0
    # native encoder present -> single APNG; else per-frame PNG fallback
    import glob

    assert os.path.exists(out) or glob.glob(str(tmp_path / "movie_*.png"))


def test_cli_record_shards_smoke(tmp_path):
    """`sph-tpu record --shards 2`: the APNG record loop over a slab-
    decomposed run (advance sharded, gather per frame, render the
    global view)."""
    from sph_tpu import cli

    out = str(tmp_path / "movie.apng")
    rc = cli.main(
        [
            "record",
            "tutorial2d",
            "--method",
            "grid",
            "--shards",
            "2",
            "--frames",
            "2",
            "--steps-per-frame",
            "5",
            "--out",
            out,
            "--width",
            "120",
            "--height",
            "90",
            "--quiet",
        ]
    )
    assert rc == 0
    import glob

    assert os.path.exists(out) or glob.glob(str(tmp_path / "movie_*.png"))


def test_cli_run_smoke(tmp_path):
    from sph_tpu import cli

    out = str(tmp_path / "out")
    rc = cli.main(
        [
            "run",
            "tutorial2d",
            "--method",
            "naive",
            "--frames",
            "2",
            "--steps-per-frame",
            "5",
            "--out",
            out,
            "--render",
            "--checkpoint-every",
            "1",
            "--quiet",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(out, "frame_00001.png"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "ckpt_00001.npz"))
    with open(os.path.join(out, "metrics.jsonl")) as fh:
        lines = fh.read().strip().splitlines()
    assert len(lines) == 2
    import json

    rec = json.loads(lines[-1])
    assert rec["step"] == 10 and np.isfinite(rec["mean_rho"])


def test_cli_run_auto_default(tmp_path):
    """The CLI's default --method (auto) resolves to the pallas flagship
    (sort-every 4 + resident + auto-rebuild) and runs end-to-end."""
    from sph_tpu import cli

    out = str(tmp_path / "outa")
    rc = cli.main(
        [
            "run",
            "tutorial2d",
            "--frames",
            "1",
            "--steps-per-frame",
            "8",
            "--out",
            out,
            "--quiet",
        ]
    )
    assert rc == 0
    import json

    with open(os.path.join(out, "metrics.jsonl")) as fh:
        rec = json.loads(fh.read().strip().splitlines()[-1])
    assert rec["step"] == 8 and np.isfinite(rec["mean_rho"])
    assert rec["cap_dropped"] == 0


def test_cli_bad_flag_combos_are_usage_errors(tmp_path, capsys):
    """Contradictory fast-path flags exit 2 with a one-line message, not
    a factory ValueError traceback (code-review round 3): the validation
    runs before backend bootstrap, so it costs no device enumeration."""
    from sph_tpu import cli

    for argv in (
        ["run", "tutorial2d", "--repair-k", "4", "--strict-audit"],
        ["run", "tutorial2d", "--method", "pallas", "--resident"],
        ["run", "tutorial2d", "--method", "grid", "--sort-every", "4"],
        ["run", "tutorial2d", "--method", "pallas", "--repair-k", "4"],
        ["run", "tutorial2d", "--method", "pallas", "--adaptive-cap"],
        ["run", "tutorial2d", "--repair-k", "-1"],
        ["record", "tutorial2d", "--repair-k", "4", "--strict-audit"],
    ):
        assert cli.main(argv) == 2, argv
        err = capsys.readouterr().err
        assert "--" in err and "Traceback" not in err, (argv, err)


def test_cli_record_repair_flag(tmp_path):
    """`record --repair-k/--strict-audit` are registered (they thread into
    the same audited advance as run; previously dead getattr defaults)."""
    from sph_tpu import cli

    out = str(tmp_path / "movie.apng")
    rc = cli.main(
        ["record", "tutorial2d", "--frames", "2", "--steps-per-frame", "8",
         "--repair-k", "8", "--out", out,
         "--width", "120", "--height", "90", "--quiet"]
    )
    assert rc == 0
    import glob

    assert os.path.exists(out) or glob.glob(str(tmp_path / "movie_*.png"))


def test_cli_run_shards_smoke(tmp_path):
    """`sph-tpu run --shards N` end-to-end on the 8-virtual-device CPU
    mesh: spatial decomposition reachable from the product surface
    (VERDICT r2 missing 1), with metrics/render/checkpoint working."""
    from sph_tpu import cli

    out = str(tmp_path / "outs")
    rc = cli.main(
        [
            "run",
            "tutorial2d",
            "--method",
            "grid",
            "--shards",
            "4",
            "--frames",
            "2",
            "--steps-per-frame",
            "5",
            "--out",
            out,
            "--render",
            "--checkpoint-every",
            "1",
            "--quiet",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(out, "frame_00001.png"))
    assert os.path.exists(os.path.join(out, "ckpt_00001.npz"))
    with open(os.path.join(out, "metrics.jsonl")) as fh:
        lines = fh.read().strip().splitlines()
    assert len(lines) == 2
    import json

    rec = json.loads(lines[-1])
    assert rec["step"] == 10 and rec["shards"] == 4
    assert np.isfinite(rec["mean_rho"]) and rec["n_active"] > 0


def test_cli_shards_packed_rows_notice(tmp_path, capsys):
    """`--packed-rows on --shards N` runs on the slot layout with a
    stderr notice (packed rows are single-chip only — docs/SCALING.md);
    never a silent behavior fork or a traceback."""
    from sph_tpu import cli

    rc = cli.main(
        [
            "run", "tutorial2d", "--method", "grid",
            "--shards", "2", "--packed-rows", "on",
            "--frames", "1", "--steps-per-frame", "4",
            "--out", str(tmp_path / "outs"), "--quiet",
        ]
    )
    assert rc == 0
    assert "--packed-rows is single-chip only" in capsys.readouterr().err


def test_cli_run_shards_fastpath_smoke(tmp_path):
    """--shards with the flagship fast path flags (--sort-every 4
    --resident, method pallas) runs end-to-end under decomposition."""
    from sph_tpu import cli

    out = str(tmp_path / "outf")
    import json

    rc = cli.main(
        [
            "run",
            "tutorial2d",
            "--method",
            "pallas",
            "--shards",
            "2",
            "--sort-every",
            "4",
            "--resident",
            "--frames",
            "1",
            "--steps-per-frame",
            "8",
            "--out",
            out,
            "--quiet",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "metrics.jsonl")) as fh:
        rec = json.loads(fh.read().strip().splitlines()[-1])
    assert rec["step"] == 8 and np.isfinite(rec["mean_rho"])


def test_cli_run_shards_repair_smoke(tmp_path):
    """--repair-k reaches the decomposed fast path (it used to be
    silently dropped under --shards): minority repair compiles and runs
    across the mesh from the CLI."""
    from sph_tpu import cli

    out = str(tmp_path / "outr")
    rc = cli.main(
        [
            "run",
            "tutorial2d",
            "--method",
            "pallas",
            "--shards",
            "2",
            "--sort-every",
            "4",
            "--resident",
            "--repair-k",
            "4",
            "--frames",
            "1",
            "--steps-per-frame",
            "8",
            "--out",
            out,
            "--quiet",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "metrics.jsonl")) as fh:
        rec = json.loads(fh.read().strip().splitlines()[-1])
    assert rec["step"] == 8 and np.isfinite(rec["mean_rho"])


def test_cli_shards_flag_validation(tmp_path, capsys):
    """Bad --shards values die as usage errors (exit 2 + message), not
    tracebacks: negative counts, and a pencil axis colliding with the
    DEFAULT second axis (2D: axis2 defaults to dim-1 = 1)."""
    from sph_tpu import cli

    with pytest.raises(SystemExit):  # argparse rejects in _parse_shards
        cli.main(["run", "tutorial2d", "--shards", "-2", "--quiet"])
    capsys.readouterr()
    rc = cli.main(
        ["run", "tutorial2d", "--shards", "2x2", "--shard-axis", "1",
         "--frames", "1", "--out", str(tmp_path / "x"), "--quiet"]
    )
    assert rc == 2
    assert "--shard-axis2 must differ" in capsys.readouterr().err


def test_cli_run_shards_resume(tmp_path):
    """Checkpoint/resume composes with decomposition: a checkpoint from a
    decomposed run (saved from the gathered global view) resumes into a
    fresh decomposed run, step counter intact (SURVEY.md §5.4 + C16)."""
    from sph_tpu import cli

    out1 = str(tmp_path / "o1")
    rc = cli.main(
        ["run", "tutorial2d", "--method", "grid", "--shards", "2",
         "--frames", "2", "--steps-per-frame", "5",
         "--checkpoint-every", "1", "--out", out1, "--quiet"]
    )
    assert rc == 0
    ckpt = os.path.join(out1, "ckpt_00001.npz")
    assert os.path.exists(ckpt)
    out2 = str(tmp_path / "o2")
    rc = cli.main(
        ["run", "tutorial2d", "--method", "grid", "--shards", "2",
         "--frames", "1", "--steps-per-frame", "5",
         "--resume", ckpt, "--out", out2, "--quiet"]
    )
    assert rc == 0
    with open(os.path.join(out2, "metrics.jsonl")) as fh:
        rec = json.loads(fh.read().strip().splitlines()[-1])
    assert rec["step"] == 15  # 10 from the first run + 5 resumed
    assert np.isfinite(rec["mean_rho"])


def test_cli_run_pencil_smoke(tmp_path):
    """`sph-tpu run --shards 2x2` end-to-end on the 8-virtual-device CPU
    mesh: pencil (2-axis) decomposition reachable from the product
    surface, same audited/elastic-recovery loop as slabs.  --method auto
    downgrades to per-step pallas with a note (pencils have no resident
    fast path)."""
    from sph_tpu import cli

    out = str(tmp_path / "outp")
    import json

    rc = cli.main(
        [
            "run",
            "tutorial2d",
            "--shards",
            "2x2",
            "--frames",
            "2",
            "--steps-per-frame",
            "5",
            "--out",
            out,
            "--quiet",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "metrics.jsonl")) as fh:
        rec = json.loads(fh.read().strip().splitlines()[-1])
    assert rec["step"] == 10 and rec["shards"] == 4
    assert rec["mesh"] == "2x2"
    assert np.isfinite(rec["mean_rho"]) and rec["n_active"] > 0


def test_audited_pencil_advance_raises_on_overflow(monkeypatch):
    """A nonzero pencil audit has no faster path to fall back from — it
    must surface as SpatialCapOverflow so the CLI's elastic-recovery
    loop rebuilds the PencilSpec and recompiles (SURVEY.md §5.3)."""
    from types import SimpleNamespace

    from sph_tpu import decomp

    calls = {}

    def fake_make(scene, spec, mesh, method, spd):
        calls["built"] = True
        return lambda loc: (loc, 3)

    monkeypatch.setattr(decomp, "make_pencil_advance", fake_make)
    audited = decomp.make_audited_pencil_advance(None, None, None, "pallas", 5)
    assert calls["built"]
    loc = SimpleNamespace(step=42)
    with pytest.raises(decomp.SpatialCapOverflow, match="worst=3"):
        audited(loc)

    monkeypatch.setattr(
        decomp, "make_pencil_advance",
        lambda *a: (lambda loc: (loc, 0)),
    )
    ok = decomp.make_audited_pencil_advance(None, None, None, "pallas", 5)
    assert ok(loc) is loc


def test_cli_run_shards_interact(tmp_path):
    """Live interaction under decomposition: a mid-run force_field
    rebuilds (spec, loc, adv) TOGETHER — build() re-sizes caps from
    current occupancy, so rebinding only adv could pair a new program
    with old-shaped sharded state."""
    from sph_tpu import cli

    cmdf = tmp_path / "cmds.jsonl"
    cmdf.write_text(
        json.dumps(
            {
                "force_field": {
                    "pos": [32.0, 32.0],
                    "strength": 50.0,
                    "radius": 20.0,
                    "duration_steps": 10,
                }
            }
        )
        + "\n"
    )
    out = str(tmp_path / "outi")
    rc = cli.main(
        [
            "run",
            "tutorial2d",
            "--method",
            "grid",
            "--shards",
            "2",
            "--frames",
            "3",
            "--steps-per-frame",
            "5",
            "--interact",
            str(cmdf),
            "--out",
            out,
            "--quiet",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "metrics.jsonl")) as fh:
        recs = [json.loads(ln) for ln in fh.read().strip().splitlines()]
    assert len(recs) == 3 and recs[-1]["step"] == 15
    assert all(np.isfinite(r["mean_rho"]) for r in recs)


def test_checked_step_passes_healthy_state():
    """Debug checking mode (SURVEY.md §5.2): a healthy state steps clean."""
    scene = small_scene(dim=2, seed=90)
    state = init(scene)
    checked = jax.jit(diagnostics.make_checked_step(scene, "grid"))
    err, out = checked(state)
    err.throw()  # no-op on a healthy state
    assert int(out.step) == 1


def test_checked_step_catches_injected_nan():
    scene = small_scene(dim=2, seed=91)
    state = diagnostics.inject_nan(init(scene), k=3)
    checked = jax.jit(diagnostics.make_checked_step(scene, "grid"))
    err, _ = checked(state)
    with pytest.raises(Exception, match="non-finite active position"):
        err.throw()


def test_checked_step_catches_out_of_bounds_cell():
    """An exploded (finite but far outside the domain) position trips the
    pre-clip cell-bounds assert — the production path would clip silently."""
    import dataclasses as _dc

    scene = small_scene(dim=2, seed=92)
    state = init(scene)
    x = state.x.at[0].set(jnp.asarray([1e7, 1e7]))
    state = _dc.replace(state, x=x)
    checked = jax.jit(diagnostics.make_checked_step(scene, "grid"))
    err, _ = checked(state)
    with pytest.raises(Exception, match="out of grid bounds"):
        err.throw()


def test_checked_step_catches_cap_overflow():
    """Overflowing the static tile cap is reported with the drop count."""
    from sph_tpu.params import Block, calibrate

    p = SimParams(boundary_mode="clamp")
    scene = calibrate(
        Scene(
            params=p,
            lo=(0.0, 0.0),
            hi=(400.0, 400.0),
            # pathological: everything crammed into ~one cell, with a
            # deliberately tiny tile cap
            blocks=(Block(lo=(100.0, 100.0), hi=(106.0, 106.0)),),
            spacing=0.4,
            grid_cap=8,
            seed=93,
        )
    )
    state = init(scene)
    checked = jax.jit(diagnostics.make_checked_step(scene, "grid"))
    err, _ = checked(state)
    with pytest.raises(Exception, match="cell tile overflow"):
        err.throw()


def test_cli_run_pencil_resume(tmp_path):
    """Checkpoint/resume composes with PENCIL decomposition too: a
    checkpoint from a 2x2-pencil run resumes into a fresh pencil run."""
    from sph_tpu import cli

    out1 = str(tmp_path / "o1")
    rc = cli.main(
        ["run", "tutorial2d", "--method", "grid", "--shards", "2x2",
         "--frames", "2", "--steps-per-frame", "5",
         "--checkpoint-every", "1", "--out", out1, "--quiet"]
    )
    assert rc == 0
    ckpt = os.path.join(out1, "ckpt_00001.npz")
    assert os.path.exists(ckpt)
    out2 = str(tmp_path / "o2")
    rc = cli.main(
        ["run", "tutorial2d", "--method", "grid", "--shards", "2x2",
         "--frames", "1", "--steps-per-frame", "5",
         "--resume", ckpt, "--out", out2, "--quiet"]
    )
    assert rc == 0
    with open(os.path.join(out2, "metrics.jsonl")) as fh:
        rec = json.loads(fh.read().strip().splitlines()[-1])
    assert rec["step"] == 15
    assert np.isfinite(rec["mean_rho"])
