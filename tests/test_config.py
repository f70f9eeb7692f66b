"""Config system (SURVEY.md §5.6): JSON round-trips, presets, calibration,
state validation."""

import json

import numpy as np
import pytest

from helpers import small_scene

from sph_tpu import diagnostics
from sph_tpu.params import (
    SimParams,
    calibrate,
    preset,
    preset_names,
    scene_from_json,
    scene_to_json,
)
from sph_tpu.state import init


def test_simparams_json_roundtrip():
    p = SimParams(dim=3, gravity=(0.0, -9.81, 0.0), eos="tait",
                  integrator="leapfrog", kernel_norm="proper")
    assert SimParams.from_json(p.to_json()) == p


def test_scene_json_roundtrip():
    scene = preset("emitters3d")
    assert scene_from_json(scene_to_json(scene)) == scene


def test_scene_json_roundtrip_init_identical():
    scene = small_scene(dim=2, seed=90)
    scene2 = scene_from_json(scene_to_json(scene))
    a, b = init(scene), init(scene2)
    assert np.array_equal(np.asarray(a.x), np.asarray(b.x))


def test_all_presets_construct_and_validate():
    for name in preset_names():
        scene = preset(name)
        assert scene.params.dim in (2, 3)
        assert len(scene.lo) == scene.params.dim
        # mass calibration happened (default placeholder mass replaced)
        assert scene.params.mass != SimParams().mass


def test_invalid_params_rejected():
    with pytest.raises(ValueError):
        SimParams(dim=3)  # gravity has 2 components by default
    with pytest.raises(ValueError):
        from sph_tpu.kernels import kernel_constants

        kernel_constants(2, 16.0, "bogus")
    with pytest.raises(KeyError):
        preset("nope")


def test_validate_state_flags_problems():
    scene = small_scene(dim=2)
    state = init(scene)
    assert diagnostics.validate_state(state, scene) == []
    bad = diagnostics.inject_nan(state, k=2)
    problems = diagnostics.validate_state(bad, scene)
    assert any("non-finite" in p for p in problems)
