"""prepare_h5 rescale_intensity parity vs the reference oracle
(reference: data/prepare_h5.py:9-26 / evaluate.py:23-40 — same function)."""

import numpy as np

from afcm_tpu.data.prepare_h5 import rescale_intensity


def _ref_rescale(volume, percentils=(0.5, 99.5), bins_num=256, norm=False):
    """Verbatim reference semantics for the oracle (evaluate.py:23-40)."""
    volume = volume.copy()
    obj_volume = volume[np.where(volume > 0)]
    min_value = np.percentile(obj_volume, percentils[0])
    max_value = np.percentile(obj_volume, percentils[1])
    if bins_num == 0:
        obj_volume = ((obj_volume - min_value) /
                      (max_value - min_value)).astype(np.float32)
    else:
        obj_volume = np.round((obj_volume - min_value) /
                              (max_value - min_value) * (bins_num - 1))
        obj_volume[np.where(obj_volume < 1)] = 1
        obj_volume[np.where(obj_volume > (bins_num - 1))] = bins_num - 1
    volume = volume.astype(obj_volume.dtype)
    volume[np.where(volume > 0)] = obj_volume
    if norm:
        volume = volume.astype(float) / (bins_num - 1)
    return volume


def test_rescale_intensity_matches_reference():
    rng = np.random.RandomState(0)
    vol = rng.gamma(2.0, 120.0, size=(8, 32, 32)).astype(np.float32)
    vol[vol < 30] = 0          # background zeros are preserved untouched
    for kwargs in (dict(), dict(bins_num=0), dict(norm=True),
                   dict(percentils=(2, 98), bins_num=128)):
        got = rescale_intensity(vol.copy(), **kwargs)
        want = _ref_rescale(vol, **kwargs)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # binned output lives in {0} + [1, bins-1]
    out = rescale_intensity(vol.copy())
    fg = out[vol > 0]
    assert fg.min() >= 1 and fg.max() <= 255
    np.testing.assert_array_equal(out[vol == 0], 0)
