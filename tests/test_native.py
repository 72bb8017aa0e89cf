"""Native ASCII parser: correctness of both the C++ path and the fallback."""

import numpy as np
import pytest

from i3rc_tpu.native import fastparse


@pytest.mark.parametrize("use_native", [True, False])
def test_parse_float_tokens(monkeypatch, use_native):
    if use_native and not fastparse.native_available():
        pytest.skip("native _fastparse.so not built (scripts/build_native.sh)")
    if not use_native:
        monkeypatch.setattr(fastparse, "_lib", None)
    out = fastparse.parse_float_tokens(" 1.5\n2 -3e4\t0.5D+03 7.25 ")
    np.testing.assert_allclose(out, [1.5, 2.0, -3e4, 500.0, 7.25])
    assert fastparse.parse_float_tokens("").size == 0
    with pytest.raises(ValueError):
        fastparse.parse_float_tokens("1.0 oops 2.0")


def test_used_by_scene_readers():
    from i3rc_tpu.models.radar_cloud import load_extinction

    ext = load_extinction()
    assert ext.shape == (640, 1, 54)
    assert 0.01 < float(ext.max()) < 10.0  # max tau/cell ~3 over 45 m
