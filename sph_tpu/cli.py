"""CLI driver (SURVEY.md C1): run / render / bench entry points.

The reference's main() opens a window and loops input→step→render; headless
TPU-native form: `sph-tpu run <preset>` scans steps on device, streams frame
PNGs + JSONL metrics to an output directory, watchdog-checked, with periodic
checkpoints and resume.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

from sph_tpu.platform import ensure_backend, probe_backend

def _bootstrap_backend() -> None:
    """Stale JAX_PLATFORMS env (axon-era rename) AND dead-tunnel
    protection: TPU device enumeration blocks FOREVER during a tunnel
    outage (CLAUDE.md), so probe with a timeout and die with a message
    instead of hanging silently.  Called from main() AFTER argument
    parsing, right before a command touches a device — `--help`, usage
    errors, and `presets` never pay for device enumeration.  A process
    that already forced CPU (tests, ad-hoc scripts) skips the probe.

    The probe announces itself on stderr so a cold/dead tunnel is a
    visible wait, not silence.  Every device-touching invocation pays the
    subprocess probe on purpose: an outage can start at any moment and
    last hours (CLAUDE.md), so skipping the probe on any freshness
    heuristic would reintroduce the unbounded in-process hang this
    exists to prevent."""
    if (jax.config.jax_platforms or "") != "cpu":
        print(
            "sph-tpu: probing the TPU backend (may take minutes on a "
            "cold tunnel; a dead tunnel exits after 600 s) ...",
            file=sys.stderr, flush=True,
        )
        if probe_backend(600) == "timeout":
            sys.exit(
                "sph-tpu: TPU device enumeration hung 600 s — tunnel "
                "outage? (force CPU with "
                "jax.config.update('jax_platforms', 'cpu'))"
            )
    ensure_backend()


from sph_tpu import diagnostics, render
from sph_tpu.params import calibrate, preset, preset_names, scene_from_json
from sph_tpu.state import init
from sph_tpu.state import spawn as spawn_particles
from sph_tpu.step import make_audited_advance, prime


class _Interactor:
    """Headless live-interaction hook (reference keyboard/mouse, SURVEY.md
    §3.4): between dispatches, consume appended JSON lines from a command
    file.  Commands:

      {"force_field": {"pos": [x, y(, z)], "strength": S,
                       "radius": R, "duration_steps": D}}
          — a drag/push probe starting NOW (step-scheduled ForceField;
            changing the scene retraces the step, ~seconds, once per
            interaction — the TPU-native cost model for live input)
      {"spawn": {"pos": [x, y(, z)], "n": N, "velocity": [vx, ...],
                 "radius": R}}
          — inject up to N particles around pos NOW (the reference's
            keypress spawn; claims never-activating slots — see
            state.spawn; zero retrace single-chip, one respec per
            spawn under --shards)
      {"pause": true} / {"resume": true}
      {"reset": true}
          — re-seed the scene from scratch (the reference's reset key);
            the step clock restarts at 0, so step-scheduled emitters and
            force fields re-fire on the new clock

    The scene's jitted step closes over force fields, so each interaction
    rebuilds `advance`; between interactions there is zero overhead."""

    def __init__(self, path: str):
        self.path = path
        self.offset = 0
        self.paused = False
        # state-mutating commands, FILE ORDER preserved: ("spawn", kwargs)
        # or ("reset", None) — reset-then-spawn must keep the spawn, and
        # spawn-then-reset must discard it, exactly as typed
        self.events: list[tuple[str, dict | None]] = []
        self._spawn_seq = 0

    def take_events(self) -> list[tuple[str, dict | None]]:
        """Drain pending state-mutating commands in file order."""
        out, self.events = self.events, []
        return out

    def poll(self, scene, step_now: int):
        """→ (scene, changed)."""
        import json as _json

        from sph_tpu.params import ForceField

        try:
            with open(self.path) as fh:
                fh.seek(self.offset)
                lines = fh.read()
                self.offset = fh.tell()
        except FileNotFoundError:
            return scene, False
        changed = False
        for line in lines.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                cmd = _json.loads(line)
            except ValueError:
                print(f"interact: bad JSON line ignored: {line!r}",
                      file=sys.stderr)
                continue
            if cmd.get("pause"):
                self.paused = True
            if cmd.get("resume"):
                self.paused = False
            if cmd.get("reset"):
                self.events.append(("reset", None))
            ff = cmd.get("force_field")
            if ff:
                field = ForceField(
                    pos=tuple(float(c) for c in ff["pos"]),
                    strength=float(ff["strength"]),
                    radius=float(ff.get("radius", 64.0)),
                    start_step=step_now,
                    stop_step=step_now + int(ff.get("duration_steps", 200)),
                )
                scene = scene.replace(
                    force_fields=scene.force_fields + (field,)
                )
                changed = True
                print(f"interact: force field @{field.pos} "
                      f"until step {field.stop_step}", file=sys.stderr)
            sp = cmd.get("spawn")
            if sp:
                try:
                    req = {"pos": [float(c) for c in sp["pos"]],
                           "n": int(sp.get("n", 64))}
                    if "velocity" in sp:
                        req["velocity"] = [float(c) for c in sp["velocity"]]
                    if "radius" in sp:
                        req["radius"] = float(sp["radius"])
                    # vary the lattice jitter per spawn: two identical
                    # commands must not place bitwise-coincident particles
                    # (an r≈0 pair never separates via pressure)
                    req["seed"] = int(sp.get("seed", self._spawn_seq))
                    self._spawn_seq += 1
                except (KeyError, TypeError, ValueError) as e:
                    print(f"interact: bad spawn command ignored ({e}): "
                          f"{line!r}", file=sys.stderr)
                    continue
                self.events.append(("spawn", req))
        return scene, changed


def _parse_shards(text) -> tuple[int, ...] | None:
    """`--shards` value: "0" → None (single-chip), "N" → 1-axis slabs,
    "N1xN2" → 2-axis pencils (decomp.PencilSpec, SURVEY.md §5.7)."""
    s = str(text).lower().strip()
    if "x" in s:
        n1, n2 = (int(p) for p in s.split("x", 1))
        if n1 < 1 or n2 < 1:
            raise ValueError(f"bad --shards {text!r}")
        return (n1, n2)
    n = int(s)
    if n < 0:
        raise ValueError(f"bad --shards {text!r}")
    return (n,) if n else None


class _UsageError(Exception):
    """Bad flag combination on a decomposed run/record; message → stderr."""


def _decomp_setup(args, scene, spf, dims):
    """Shared by `run --shards` and `record --shards`: validate the flag
    set, build the device mesh, and return (build, mesh_desc, n_total)
    where build(sc, st) -> (spec, loc, adv) shards st over the mesh and
    compiles the audited advance.  Raises _UsageError on a bad combo.
    May downgrade args.sort_every/resident (pencil) and round spf."""
    from sph_tpu import decomp
    from sph_tpu.step import default_skin

    pencil = len(dims) == 2
    n_total = dims[0] * dims[1] if pencil else dims[0]
    mesh_desc = "x".join(str(d) for d in dims)
    if getattr(args, "debug", False):
        raise _UsageError("--debug is not supported with --shards")
    if pencil and (args.sort_every > 1 or args.resident
                   or getattr(args, "repair_k", 0)):
        # the pencil path is per-step-rebuild only (slabs carry the
        # fast path); --method auto lands here too, downgraded with a note
        print(
            "note: pencil decomposition steps per-step; "
            "--sort-every/--resident/--repair-k are ignored",
            file=sys.stderr,
        )
        args.sort_every, args.resident = 1, False
        if hasattr(args, "repair_k"):
            args.repair_k = 0
    if args.sort_every > 1:
        spf -= spf % args.sort_every
        spf = max(spf, args.sort_every)
        if args.method != "pallas":
            raise _UsageError("--sort-every>1 requires --method pallas")
    n_dev = len(jax.devices())
    if n_total > n_dev:
        raise _UsageError(
            f"--shards {mesh_desc} needs {n_total} devices, "
            f"{n_dev} visible"
        )
    if pencil:
        # resolve the default here so a collision with the DEFAULT second
        # axis is a clean usage error, not a traceback out of build()
        if args.shard_axis2 is None:
            args.shard_axis2 = scene.params.dim - 1
        if args.shard_axis2 == args.shard_axis:
            raise _UsageError("--shard-axis2 must differ from --shard-axis")
    if getattr(args, "adaptive_cap", False):
        print(
            "note: --adaptive-cap is single-chip only; ignored with --shards",
            file=sys.stderr,
        )
    if getattr(args, "packed_rows", "auto") != "auto":
        # the packed-row sparse-scene layout is single-chip only: the slab
        # fast path's face-band membership lemma and interior-only repair
        # are slot-structural (decomp.py _make_spatial_resident_auto), and
        # a slab cut along x breaks the packed kernels' row-x-completeness
        # argument (docs/SCALING.md).  Decomposed sparse scenes run the
        # slot layout.
        print(
            "note: --packed-rows is single-chip only; ignored with "
            "--shards (slot layout used)",
            file=sys.stderr,
        )
    mesh = (
        decomp.mesh2d(*dims) if pencil else decomp.mesh1d(n_total)
    )
    skin = default_skin(scene, args.sort_every) if args.sort_every > 1 else 0.0

    def build(sc, st):
        if pencil:
            spec = decomp.PencilSpec.for_state(
                sc, st, dims[0], dims[1],
                axis1=args.shard_axis, axis2=args.shard_axis2,
            )
            loc = decomp.pencil_shard_state(st, sc, spec, mesh)
            adv = decomp.make_audited_pencil_advance(
                sc, spec, mesh, args.method, spf
            )
            return spec, loc, adv
        spec = decomp.SpatialSpec.for_state(
            sc, st, n_total, axis=args.shard_axis, skin=skin
        )
        loc = decomp.spatial_shard_state(st, sc, spec, mesh)
        adv = decomp.make_audited_spatial_advance(
            sc, spec, mesh, args.method, spf,
            sort_every=args.sort_every, slot_resident=args.resident,
            membership_audit=not getattr(args, "strict_audit", False),
            repair_k=getattr(args, "repair_k", None),
        )
        return spec, loc, adv

    return build, mesh_desc, n_total


def _packed_rows_arg(args):
    """--packed-rows {auto,on,off} → None/True/False (step.run semantics)."""
    val = getattr(args, "packed_rows", "auto")
    return {"auto": None, "on": True, "off": False}[val]


def _run_spatial(args, scene, state, spf, inner, dims) -> int:
    """`sph-tpu run --shards N` (slabs) or `--shards N1xN2` (pencils):
    domain decomposition across the device mesh (SURVEY.md C16/§5.7),
    with the audited-fallback policy extended across the mesh and
    ELASTIC RECOVERY: a SpatialCapOverflow (static buffers outgrown by
    the flow) rebuilds the Spatial/PencilSpec from the gathered state
    and recompiles, then continues (SURVEY.md §5.3)."""
    from sph_tpu import decomp

    try:
        build, mesh_desc, n_total = _decomp_setup(args, scene, spf, dims)
    except _UsageError as e:
        print(str(e), file=sys.stderr)
        return 2
    pencil = len(dims) == 2

    spec, loc, adv = build(scene, state)
    pack_fn = jax.jit(lambda s: diagnostics.scalar_pack(s, scene.params))
    watchdog = diagnostics.Watchdog(scene.params)
    interactor = _Interactor(args.interact) if args.interact else None
    metrics_path = os.path.join(args.out, "metrics.jsonl")
    t0 = time.perf_counter()
    with open(metrics_path, "a") as mf:
        for frame in range(args.frames):
            if interactor is not None:
                scene, changed = interactor.poll(scene, int(loc.step))
                while interactor.paused:
                    time.sleep(0.2)
                    scene, ch2 = interactor.poll(scene, int(loc.step))
                    changed = changed or ch2
                events = interactor.take_events()
                if changed or events:
                    # ONE gather → fold every command in file order →
                    # ONE re-spec/reshard/rebuild: build() re-sizes caps
                    # from the final occupancy and spawned particles
                    # route to the slab/pencil owning their position;
                    # coalescing keeps interaction latency to a single
                    # recompile however many commands arrived together
                    st_g = decomp.spatial_gather_state(loc)
                    mutated = changed
                    for kind_, req in events:
                        if kind_ == "reset":
                            st_g = _fresh_state(scene, args.method)
                            mutated = True
                            print("interact: scene reset", file=sys.stderr)
                            continue
                        try:
                            st_g, k = spawn_particles(st_g, scene, **req)
                        except ValueError as e:
                            print(f"interact: spawn ignored ({e})",
                                  file=sys.stderr)
                            continue
                        mutated = mutated or k > 0
                        print(
                            f"interact: spawned {k} particles "
                            f"@ {req['pos']}", file=sys.stderr,
                        )
                    if mutated:
                        spec, loc, adv = build(scene, st_g)
            for _ in range(inner):
                try:
                    loc = adv(loc)
                except decomp.SpatialCapOverflow as e:
                    print(f"elastic recovery: {e}", file=sys.stderr)
                    spec, loc, adv = build(
                        scene, decomp.spatial_gather_state(loc)
                    )
                    loc = adv(loc)
            view = decomp.spatial_gather_state(loc)
            pack = pack_fn(view)
            if args.render:
                render.save_frame(
                    view, scene,
                    os.path.join(args.out, f"frame_{frame:05d}.png"),
                    width=args.width, height=args.height,
                    mode=args.mode, radius=args.radius,
                )
            try:
                scalars = watchdog.check(pack)
            except diagnostics.SimulationDiverged as e:
                dump = os.path.join(args.out, "diverged_state.npz")
                diagnostics.save_checkpoint(dump, view, scene)
                print(f"DIVERGED at frame {frame}: {e}; state -> {dump}",
                      file=sys.stderr)
                return 2
            scalars["frame"] = frame
            scalars["step"] = int(loc.step)
            scalars["shards"] = n_total
            if pencil:
                scalars["mesh"] = mesh_desc
            scalars["wall_s"] = time.perf_counter() - t0
            # audited-policy observability (same fields as the 1-chip
            # loop): mesh demotions become visible in metrics.jsonl
            if hasattr(adv, "mode"):
                scalars["advance_mode"] = adv.mode
            if hasattr(adv, "healed"):
                scalars["healed_blocks"] = adv.healed
                scalars["repaired_blocks"] = getattr(adv, "repaired", 0)
            mf.write(json.dumps(scalars) + "\n")
            mf.flush()
            if args.checkpoint_every and (frame + 1) % args.checkpoint_every == 0:
                diagnostics.save_checkpoint(
                    os.path.join(args.out, f"ckpt_{frame:05d}.npz"),
                    view, scene,
                )
            if not args.quiet:
                print(
                    f"frame {frame:4d} step {int(loc.step):7d} "
                    f"n={int(scalars['n_active'])} "
                    f"max|v|={scalars['max_speed']:8.2f} "
                    f"rho={scalars['mean_rho']:8.2f} "
                    f"shards={mesh_desc} "
                    f"({scalars['wall_s']:.1f}s)"
                )
    return 0


def _fresh_state(scene, method: str):
    """init + leapfrog prime: the ONE definition of "a fresh state ready
    to step with `method`" — startup (run/record) and the live reset
    command share it, so priming changes cannot drift between them."""
    state = init(scene)
    if scene.params.integrator == "leapfrog":
        state = jax.jit(lambda s: prime(scene, s, method=method))(state)
    return state


def _load_scene(name_or_path: str):
    """A preset name, or a path to a Scene .json (mass-calibrated)."""
    if name_or_path.endswith(".json"):
        with open(name_or_path) as fh:
            return calibrate(scene_from_json(fh.read()))
    return preset(name_or_path)


def _record_spatial(args, scene, state, spf, inner, dims) -> int:
    """`sph-tpu record --shards ...`: the APNG record loop over a
    decomposed run — advance sharded, gather per frame, render the
    global view; same audited-fallback + elastic recovery as run."""
    import numpy as np

    from sph_tpu import decomp

    try:
        build, mesh_desc, n_total = _decomp_setup(args, scene, spf, dims)
    except _UsageError as e:
        print(str(e), file=sys.stderr)
        return 2
    spec, loc, adv = build(scene, state)
    render_fn = jax.jit(
        lambda s: render.render_splat(
            s, scene, args.width, args.height, args.mode,
            radius=args.radius,
        )
    )
    fields = []
    t0 = time.time()
    for frame in range(args.frames):
        for _ in range(inner):
            try:
                loc = adv(loc)
            except decomp.SpatialCapOverflow as e:
                print(f"elastic recovery: {e}", file=sys.stderr)
                spec, loc, adv = build(
                    scene, decomp.spatial_gather_state(loc)
                )
                loc = adv(loc)
        fields.append(np.asarray(render_fn(decomp.spatial_gather_state(loc))))
        if not args.quiet:
            print(
                f"frame {frame} shards={mesh_desc} ({time.time()-t0:.1f}s)",
                flush=True,
            )
    render.save_apng(args.out, fields, fps=args.fps)
    print(f"wrote {args.out} ({len(fields)} frames)")
    return 0


def _validate_fastpath_flags(args) -> None:
    """Reject bad fast-path flag combos with a clean usage error instead
    of letting a factory ValueError escape as a traceback (step.py would
    otherwise raise on repair_k+strict-audit, or silently ignore repair_k
    / adaptive_cap off the resident path).  Call after _resolve_method —
    `--method auto` turns on the resident fast path, so these only fire
    on explicitly contradictory flags.  The --debug path ignores the
    reuse knobs by design (it prints a note), so it skips them here."""
    rk = getattr(args, "repair_k", None)
    if rk is None:
        # auto: step.default_repair_k resolves it per path (2048 on the
        # auto fast path, 0 wherever repair is unsupported) — nothing to
        # validate here
        rk = 0
    if rk < 0:
        raise _UsageError("--repair-k must be >= 0")
    if rk and getattr(args, "strict_audit", False):
        raise _UsageError(
            "--repair-k needs the membership-relaxed audit; "
            "drop --strict-audit"
        )
    if getattr(args, "debug", False):
        return
    if args.resident and args.sort_every <= 1:
        raise _UsageError(
            "--resident requires --sort-every>1 (or leave --method auto)"
        )
    if args.sort_every > 1 and args.method != "pallas":
        raise _UsageError("--sort-every>1 requires --method pallas")
    if rk and not (args.resident and args.sort_every > 1):
        raise _UsageError(
            "--repair-k requires the resident fast path "
            "(--resident --sort-every>1, or leave --method auto)"
        )
    if getattr(args, "adaptive_cap", False) and not args.resident:
        raise _UsageError(
            "--adaptive-cap requires --resident (or leave --method auto)"
        )


def _resolve_method(args) -> None:
    """`--method auto` (the default) = the production flagship: pallas +
    4-step Verlet-skin reuse + slot-resident blocks with auto-rebuild
    (make_audited_advance's policy — exact fallback on every audit).
    Explicit --sort-every/--resident flags are respected; --debug keeps
    the per-step checked path, where the reuse knobs are ignored anyway.
    The naive/grid methods remain the oracle/portable paths (the grid
    path is gather-bound and slower past ~10k — VERDICT r2)."""
    if args.method != "auto":
        return
    args.method = "pallas"
    if getattr(args, "debug", False):
        return
    if args.sort_every == 1:
        # an explicit --resident under auto keeps residency and still gets
        # the default block length (it would otherwise be a usage error
        # telling the user to do what they already did); an explicit
        # --sort-every under auto is respected as-is
        args.sort_every = 4
        args.resident = True


def cmd_run(args) -> int:
    _resolve_method(args)
    scene = _load_scene(args.preset)
    if args.resume:
        state, scene = diagnostics.load_checkpoint(args.resume)
    else:
        state = _fresh_state(scene, args.method)
    os.makedirs(args.out, exist_ok=True)
    from sph_tpu.step import MAX_PALLAS_STEPS_PER_DISPATCH

    spf = args.steps_per_frame
    inner = 1
    if args.method == "pallas" and spf > MAX_PALLAS_STEPS_PER_DISPATCH:
        # split a long frame into several dispatches (platform limit on
        # pallas launches per compiled program; see sph_tpu/step.py)
        inner = -(-spf // MAX_PALLAS_STEPS_PER_DISPATCH)
        spf = -(-args.steps_per_frame // inner)
    dims = getattr(args, "shards", None)
    if dims:
        return _run_spatial(args, scene, state, spf, inner, dims)
    if getattr(args, "debug", False):
        # sanitizer-style stepping (SURVEY.md §5.2): the checkify-
        # instrumented step threads an error value through the frame;
        # err.throw() surfaces the FIRST failed assert with its message
        if args.sort_every > 1 or args.resident:
            print(
                "note: --debug steps one-at-a-time; "
                "--sort-every/--resident are ignored",
                file=sys.stderr,
            )

        def _mk_adv(sc):
            checked = diagnostics.make_checked_step(sc, args.method)

            @jax.jit
            def _adv_dbg(st):
                errs = []
                for _ in range(spf):
                    err, st = checked(st)
                    errs.append(err)
                return errs, st

            def adv_dbg(st):
                errs, s1 = _adv_dbg(st)
                # throw the EARLIEST failed step's error (a NaN-poisoned
                # later step would otherwise mask the root cause); throw()
                # is a no-op on ok steps
                for e in errs:
                    e.throw()
                return s1

            return adv_dbg
    else:
        if args.sort_every > 1:
            spf -= spf % args.sort_every
            spf = max(spf, args.sort_every)

        def _mk_adv(sc):
            return make_audited_advance(
                sc, args.method, spf, sort_every=args.sort_every,
                slot_resident=args.resident,
                adaptive_cap=getattr(args, "adaptive_cap", False),
                membership_audit=not getattr(args, "strict_audit", False),
                repair_k=getattr(args, "repair_k", None),
                packed_rows=_packed_rows_arg(args),
            )

    # interactor scene edits rebuild via the SAME factory, so the debug
    # instrumentation / fast-path audit survive a mid-run rebuild
    adv = _mk_adv(scene)
    pack_fn = jax.jit(
        lambda s: diagnostics.scalar_pack(s, scene.params)
    )
    overflow_fn = None
    if args.method == "pallas":
        # per-frame static-cap audit (cell tiles + row compaction): the
        # kernels drop overflow by design, so surface it (SURVEY.md §5.2).
        # Audit the SAME grid geometry the stepping uses — with
        # --sort-every>1 that is the SKINNED grid, whose bigger cells
        # overflow earlier than the plain one would report.
        from sph_tpu import neighbors, pallas_step
        from sph_tpu.step import default_skin

        _base = neighbors.GridSpec.for_scene(scene)
        if args.sort_every > 1 and not getattr(args, "debug", False):
            _grid = neighbors.GridSpec.for_scene(
                scene, cap=_base.cap,
                skin=default_skin(scene, args.sort_every),
            )
        else:
            _grid = _base
        _sg = pallas_step.slot_grid(_grid)
        overflow_fn = jax.jit(
            lambda s: pallas_step.slot_overflow(s.x, s.active, _grid, _sg)
        )
    watchdog = diagnostics.Watchdog(scene.params)
    interactor = _Interactor(args.interact) if args.interact else None
    metrics_path = os.path.join(args.out, "metrics.jsonl")
    t0 = time.perf_counter()
    with open(metrics_path, "a") as mf:
        for frame in range(args.frames):
            if interactor is not None:
                scene, changed = interactor.poll(scene, int(state.step))
                if changed:
                    adv = _mk_adv(scene)
                while interactor.paused:
                    time.sleep(0.2)
                    scene, changed = interactor.poll(scene, int(state.step))
                    if changed:
                        adv = _mk_adv(scene)
                for kind_, req in interactor.take_events():
                    if kind_ == "reset":
                        state = _fresh_state(scene, args.method)
                        # rebuild the advance too: adaptive-cap / occupancy
                        # state captured in the closure (permanent cap-16
                        # switch, fitted skin) must not survive a reset
                        adv = _mk_adv(scene)
                        print("interact: scene reset", file=sys.stderr)
                        continue
                    try:
                        # pure data surgery — no retrace (state.spawn)
                        state, k = spawn_particles(state, scene, **req)
                    except ValueError as e:
                        print(f"interact: spawn ignored ({e})",
                              file=sys.stderr)
                        continue
                    print(f"interact: spawned {k} particles "
                          f"@ {req['pos']}", file=sys.stderr)
            for _ in range(inner):
                state = adv(state)
            pack = pack_fn(state)
            if args.render:
                render.save_frame(
                    state,
                    scene,
                    os.path.join(args.out, f"frame_{frame:05d}.png"),
                    width=args.width,
                    height=args.height,
                    mode=args.mode,
                    radius=args.radius,
                )
            try:
                scalars = watchdog.check(pack)
            except diagnostics.SimulationDiverged as e:
                dump = os.path.join(args.out, "diverged_state.npz")
                diagnostics.save_checkpoint(dump, state, scene)
                print(f"DIVERGED at frame {frame}: {e}; state -> {dump}",
                      file=sys.stderr)
                return 2
            scalars["frame"] = frame
            scalars["step"] = int(state.step)
            scalars["wall_s"] = time.perf_counter() - t0
            # audited-policy observability: which phase the adaptive
            # machinery is in (cap8/cap16, packed/slot, resident/perstep)
            # and the cumulative heal/repair counters — demotions and
            # layout switches become visible in metrics.jsonl
            if hasattr(adv, "mode"):
                scalars["advance_mode"] = adv.mode
            if hasattr(adv, "healed"):
                scalars["healed_blocks"] = adv.healed
                scalars["repaired_blocks"] = getattr(adv, "repaired", 0)
            if overflow_fn is not None:
                cell_over, row_over = overflow_fn(state)
                scalars["cap_dropped"] = int(cell_over)
                scalars["row_overflow"] = int(row_over)
                if scalars["cap_dropped"] or scalars["row_overflow"]:
                    print(
                        f"warning: static caps dropped work this frame "
                        f"(cells {scalars['cap_dropped']}, rows "
                        f"{scalars['row_overflow']}) — raise Scene.grid_cap "
                        f"or c_rows",
                        file=sys.stderr,
                    )
            cfl = diagnostics.cfl_limit(scene.params, scalars["max_speed"])
            if cfl is not None and scene.params.dt > cfl:
                scalars["cfl_warning"] = True
                print(
                    f"warning: dt={scene.params.dt:.2e} exceeds CFL {cfl:.2e}",
                    file=sys.stderr,
                )
            mf.write(json.dumps(scalars) + "\n")
            mf.flush()
            if args.checkpoint_every and (frame + 1) % args.checkpoint_every == 0:
                diagnostics.save_checkpoint(
                    os.path.join(args.out, f"ckpt_{frame:05d}.npz"),
                    state,
                    scene,
                )
            if not args.quiet:
                print(
                    f"frame {frame:4d} step {int(state.step):7d} "
                    f"n={int(scalars['n_active'])} "
                    f"max|v|={scalars['max_speed']:8.2f} "
                    f"rho={scalars['mean_rho']:8.2f} "
                    f"({scalars['wall_s']:.1f}s)"
                )
    return 0


def cmd_record(args) -> int:
    """Live render loop streamed from device → one animated PNG (the
    headless form of BASELINE config 5)."""
    import numpy as np

    _resolve_method(args)

    scene = _load_scene(args.preset)
    state = _fresh_state(scene, args.method)
    from sph_tpu.step import MAX_PALLAS_STEPS_PER_DISPATCH

    spf = args.steps_per_frame
    inner = 1
    if args.method == "pallas" and spf > MAX_PALLAS_STEPS_PER_DISPATCH:
        inner = -(-spf // MAX_PALLAS_STEPS_PER_DISPATCH)
        spf = -(-args.steps_per_frame // inner)
    dims = getattr(args, "shards", None)
    if dims:
        return _record_spatial(args, scene, state, spf, inner, dims)
    if args.sort_every > 1:
        spf -= spf % args.sort_every
        spf = max(spf, args.sort_every)
    adv = make_audited_advance(scene, args.method, spf,
                               sort_every=args.sort_every,
                               slot_resident=args.resident,
                               adaptive_cap=getattr(args, "adaptive_cap",
                                                    False),
                               membership_audit=not getattr(
                                   args, "strict_audit", False),
                               repair_k=getattr(args, "repair_k", None),
                               packed_rows=_packed_rows_arg(args))
    render_fn = jax.jit(
        lambda s: render.render_splat(
            s, scene, args.width, args.height, args.mode,
            radius=args.radius,
        )
    )
    fields = []
    pending = None  # overlap: fetch frame k while stepping k+1
    t0 = time.time()
    for frame in range(args.frames):
        for _ in range(inner):
            state = adv(state)
        fut = render_fn(state)
        if pending is not None:
            fields.append(np.asarray(pending))
        pending = fut
        if not args.quiet:
            print(f"frame {frame} ({time.time()-t0:.1f}s)", flush=True)
    fields.append(np.asarray(pending))
    render.save_apng(args.out, fields, fps=args.fps)
    print(f"wrote {args.out} ({len(fields)} frames)")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sph-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run a preset scene")
    runp.add_argument("preset",
                      help=f"preset name {preset_names()} or a scene .json")
    runp.add_argument("--method", default="auto",
                      choices=["auto", "naive", "grid", "pallas"],
                      help="auto (default) = the pallas flagship "
                           "(sort-every 4 + resident w/ auto-rebuild); "
                           "naive/grid = oracle/portable paths")
    runp.add_argument("--frames", type=int, default=60)
    runp.add_argument("--steps-per-frame", type=int, default=100)
    runp.add_argument("--out", default="out")
    runp.add_argument("--render", action="store_true")
    runp.add_argument("--mode", default="density",
                      choices=["density", "rho", "speed", "depth"])
    runp.add_argument("--width", type=int, default=400)
    runp.add_argument("--height", type=int, default=300)
    runp.add_argument("--radius", type=int, default=1,
                      help="splat radius in px (GL point-sprite analog)")
    runp.add_argument("--sort-every", type=int, default=1,
                      help="pallas Verlet-skin addr reuse interval "
                           "(>1: rebuild neighbor addressing every K steps)")
    runp.add_argument("--resident", action="store_true",
                      help="slot-resident block integration (fastest pallas "
                           "mode; requires --sort-every>1; emitter "
                           "activations freeze until the next rebuild)")
    runp.add_argument("--adaptive-cap", action="store_true",
                      help="start on a cap-8 slot grid while occupancy "
                           "allows (1.3-1.4x faster), healing overflow "
                           "blocks exactly and switching to the default "
                           "cap when outgrown (requires --resident)")
    runp.add_argument("--repair-k", type=int, default=None,
                      help="minority slot repair budget (auto-rebuild "
                           "resident mode): re-home up to K risky "
                           "particles in place of a full addressing "
                           "rebuild (default: auto — 2048 where "
                           "supported, measured 1.23x at the settled 1M "
                           "splash; 0 = off; see step.py repair_k)")
    runp.add_argument("--packed-rows", choices=("auto", "on", "off"),
                      default="auto",
                      help="packed-row sparse-scene kernels (resident "
                           "fast path): auto = probe the state and use "
                           "them for sparse emitter scenes (measured "
                           "3.05x kernels at the settled emitters3d), "
                           "on/off = pin")
    runp.add_argument("--strict-audit", action="store_true",
                      help="disable the membership-relaxed Verlet audit "
                           "(A/B knob: drift-only audits + velocity-"
                           "projection rebuild predicate)")
    runp.add_argument("--shards", type=_parse_shards, default=None,
                      help="domain decomposition across the device mesh: "
                           "N = spatial slabs, N1xN2 = 2-axis pencils "
                           "(0 = single-chip); audited-fallback + "
                           "elastic recovery built in")
    runp.add_argument("--shard-axis", type=int, default=0,
                      help="domain axis the slabs cut / first pencil "
                           "axis (with --shards)")
    runp.add_argument("--shard-axis2", type=int, default=None,
                      help="second pencil cut axis (with --shards N1xN2; "
                           "default: the last domain axis)")
    runp.add_argument("--interact", default=None, metavar="FILE",
                      help="poll FILE between frames for live interaction "
                           "commands (JSON lines: force_field / spawn / "
                           "reset / pause / resume) — the headless "
                           "mouse/keyboard analog (docs/DEMOS.md)")
    runp.add_argument("--debug", action="store_true",
                      help="checkify-instrumented stepping (SURVEY.md "
                           "§5.2): on-device asserts for NaN positions, "
                           "out-of-bounds cells, tile-cap overflow — "
                           "slower, per-step dispatch")
    runp.add_argument("--checkpoint-every", type=int, default=0)
    runp.add_argument("--resume", default=None)
    runp.add_argument("--quiet", action="store_true")
    runp.set_defaults(fn=cmd_run)

    recp = sub.add_parser("record", help="record an animated PNG")
    recp.add_argument("preset",
                      help=f"preset name {preset_names()} or a scene .json")
    recp.add_argument("--method", default="auto",
                      choices=["auto", "naive", "grid", "pallas"],
                      help="auto (default) = the pallas flagship "
                           "(sort-every 4 + resident w/ auto-rebuild)")
    recp.add_argument("--frames", type=int, default=100)
    recp.add_argument("--steps-per-frame", type=int, default=50)
    recp.add_argument("--out", default="out.apng")
    recp.add_argument("--mode", default="density",
                      choices=["density", "rho", "speed", "depth"])
    recp.add_argument("--width", type=int, default=400)
    recp.add_argument("--height", type=int, default=300)
    recp.add_argument("--radius", type=int, default=1,
                      help="splat radius in px (GL point-sprite analog)")
    recp.add_argument("--sort-every", type=int, default=1,
                      help="pallas Verlet-skin addr reuse interval "
                           "(>1: rebuild neighbor addressing every K steps)")
    recp.add_argument("--resident", action="store_true",
                      help="slot-resident block integration (fastest pallas "
                           "mode; requires --sort-every>1; emitter "
                           "activations freeze until the next rebuild)")
    recp.add_argument("--adaptive-cap", action="store_true",
                      help="see run --adaptive-cap")
    recp.add_argument("--packed-rows", choices=("auto", "on", "off"),
                      default="auto",
                      help="packed-row sparse-scene kernels (resident "
                           "fast path): auto = probe the state and use "
                           "them for sparse emitter scenes (measured "
                           "3.05x kernels at the settled emitters3d), "
                           "on/off = pin")
    recp.add_argument("--repair-k", type=int, default=None,
                      help="see run --repair-k")
    recp.add_argument("--strict-audit", action="store_true",
                      help="see run --strict-audit")
    recp.add_argument("--shards", type=_parse_shards, default=None,
                      help="record over a decomposed run: N = slabs, "
                           "N1xN2 = pencils (see run --shards)")
    recp.add_argument("--shard-axis", type=int, default=0,
                      help="see run --shard-axis")
    recp.add_argument("--shard-axis2", type=int, default=None,
                      help="see run --shard-axis2")
    recp.add_argument("--fps", type=float, default=20.0)
    recp.add_argument("--quiet", action="store_true")
    recp.set_defaults(fn=cmd_record)

    listp = sub.add_parser("presets", help="list presets")
    listp.set_defaults(fn=lambda a: (print("\n".join(preset_names())), 0)[1])

    benchp = sub.add_parser(
        "bench", help="throughput table (see bench/bench_step.py)"
    )
    benchp.add_argument("--steps", type=int, default=100)
    benchp.add_argument("--only", default=None)
    benchp.add_argument("--assert-floor", action="store_true")

    def _bench(a):
        import importlib.util
        import os as _os

        path = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "bench",
            "bench_step.py",
        )
        spec = importlib.util.spec_from_file_location("bench_step", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        argv = ["--steps", str(a.steps)]
        if a.only:
            argv += ["--only", a.only]
        if a.assert_floor:
            argv += ["--assert-floor"]
        import sys as _sys

        old = _sys.argv
        try:
            _sys.argv = ["bench_step"] + argv
            return mod.main()
        finally:
            _sys.argv = old

    benchp.set_defaults(fn=_bench)

    args = ap.parse_args(argv)
    if args.cmd in ("run", "record"):
        # resolve + validate flag combos BEFORE backend bootstrap, so a
        # usage error never pays (or hangs on) TPU device enumeration
        _resolve_method(args)
        try:
            _validate_fastpath_flags(args)
        except _UsageError as e:
            print(str(e), file=sys.stderr)
            return 2
    if args.cmd != "presets":  # device-free command
        _bootstrap_backend()
    try:
        return args.fn(args)
    except _UsageError as e:
        print(str(e), file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
