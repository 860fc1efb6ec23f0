"""The bench harness's object-store peak accounting must measure real
bytes: the round-5 memory-axis evidence (BASELINE.md) rests on it, so a
regression here would silently invalidate every peak_obj_bytes number.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_objstore_peak_measures_known_put(ray_session):
    import numpy as np

    from bench import _ObjStorePeak

    n = 200_000_000  # 200 MB payload, far above the sampler noise floor
    with _ObjStorePeak() as p:
        ref = ray_session.put(np.zeros(n, dtype=np.uint8))
        time.sleep(0.3)  # > several 30 ms sample intervals
    # the sampled peak must see the payload (± other session residents,
    # hence >=), and must stay within the same order of magnitude
    assert p.peak >= n
    assert p.peak < 20 * n
    del ref


def test_objstore_peak_idle_no_growth(ray_session):
    import time as _t

    from bench import _ObjStorePeak

    total = ray_session.cluster_resources().get("object_store_memory", 0.0)
    avail = ray_session.available_resources().get("object_store_memory", total)
    resident = total - avail
    with _ObjStorePeak() as p:
        _t.sleep(0.2)
    # idle session: the sampled peak tracks what is already resident
    # (± transient worker traffic), it does not invent bytes
    assert p.peak <= resident + 50_000_000
