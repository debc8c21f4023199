"""PBS counters and the measure() context (metrics.py)."""

import numpy as np

from fhestring_tpu import PARAM_TEST_ZERO_NOISE, metrics
from fhestring_tpu.client import ClientKey


def test_pbs_counters_tick_and_measure():
    metrics.reset()
    ck = ClientKey(PARAM_TEST_ZERO_NOISE, seed=11)
    srv = ck.get_server_key()
    s = ck.encrypt("abc", 1)
    pat = ck.encrypt_no_padding("bc")

    with metrics.measure("contains"):
        bit = srv.contains(s, pat)
        assert ck.decrypt_char(bit) == 1

    rec = metrics.last()
    assert rec is not None and rec.name == "contains"
    assert rec.pbs_calls > 0
    assert rec.pbs_items > 0
    assert rec.pbs_items_padded >= rec.pbs_items
    assert rec.seconds > 0

    rep = metrics.report()
    assert rep["global"]["pbs_calls"] >= rec.pbs_calls
    assert rep["records"][-1]["name"] == "contains"


def test_reset_clears():
    metrics.reset()
    assert metrics.GLOBAL.pbs_calls == 0
    assert metrics.report()["records"] == []
