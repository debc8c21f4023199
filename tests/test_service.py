"""Client/server serving layer over a real socket boundary (service.py)."""

import pytest

from fhestring_tpu import PARAM_TEST_ZERO_NOISE
from fhestring_tpu.client import ClientKey
from fhestring_tpu.service import FheStringServer, RemoteServerKey


@pytest.fixture(scope="module")
def remote():
    ck = ClientKey(PARAM_TEST_ZERO_NOISE, seed=21)
    server = FheStringServer(ck.get_server_key()).start()
    yield ck, RemoteServerKey(server.address)
    server.stop()


def test_remote_predicates(remote):
    ck, srv = remote
    s = ck.encrypt("hello world", 1)
    pat = ck.encrypt_no_padding("world")
    assert ck.decrypt_char(srv.contains(s, pat)) == 1
    assert ck.decrypt_char(srv.contains_clear(s, "xyz")) == 0
    assert ck.decrypt_char(srv.len(s)) == 11


def test_remote_rewrite_and_split(remote):
    ck, srv = remote
    s = ck.encrypt("a.b", 1)
    assert ck.decrypt(srv.to_upper(s)) == "A.B"
    parts, found = ck.decrypt_split(srv.split_clear(s, "."))
    assert [p for p in parts if p] == ["a", "b"]
    assert found == 1
    out, flag = ck.decrypt_strip(srv.strip_prefix_clear(s, "a"))
    assert (out, flag) == (".b", 1)


def test_remote_error_reporting(remote):
    ck, srv = remote
    with pytest.raises(AttributeError):
        srv.not_a_method
