"""sph_tpu — a TPU-native SPH engine.

Brand-new implementation of the capability surface of mskr/sph-tutorial
(a single-file C++ weakly-compressible SPH tutorial; see SURVEY.md for the
component inventory and provenance notes — the reference mount is empty, so
"ref" citations point at SURVEY.md sections rather than reference file:line).

Design stance (SURVEY.md §7): functional core — `State` pytree, pure
`step(state) -> state` — everything shape-static (capacity-N arrays plus
active masks, fixed-size cell tiles), one fused jitted step, `lax.scan` over
steps so the host is touched once per frame, not once per step.
"""

from sph_tpu.params import (
    Block,
    Emitter,
    ForceField,
    Scene,
    SimParams,
    calibrate,
    preset,
    preset_names,
    scene_from_json,
    scene_to_json,
)
from sph_tpu.state import State, init, spawn
from sph_tpu.step import (
    make_advance,
    make_audited_advance,
    make_step,
    prime,
    run,
)

__all__ = [
    "SimParams",
    "Scene",
    "Block",
    "Emitter",
    "ForceField",
    "calibrate",
    "preset",
    "preset_names",
    "scene_from_json",
    "scene_to_json",
    "State",
    "init",
    "spawn",
    "make_step",
    "make_advance",
    "make_audited_advance",
    "prime",
    "run",
]

__version__ = "0.1.0"
