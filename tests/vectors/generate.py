#!/usr/bin/env python
"""Regenerate reference_vectors.json — the golden parity vectors.

Provenance: the environment has no Rust toolchain, so the reference binary
(/root/reference) cannot be executed to record live tfhe-rs decryptions.
Instead, every vector below is transcribed from the reference's own test
suite (/root/reference/src/main.rs:118-1154): the INPUTS (string, pattern,
paddings, n) are copied verbatim from each #[test] fn, and the EXPECTED
value is the one the reference asserts — which for every test is Rust
std's result on those inputs (assert_eq!(decrypted, std_result)), plus the
reference's explicit sentinels (255 for not-found rfind, main.rs:591;
panic on oversize find, main.rs:594-611). Rust std and Python str agree on
all these ASCII inputs; this script freezes the values as literals so the
test suite never recomputes them from the same code it is checking.

Split-family expectations are stored post-normalization, exactly as the
reference compares them: trim_str_vector(std_result) (utils.rs:59-92),
with rsplit* results in reverse order and rsplit_once as [after, before]
(main.rs:1093-1094).

Usage: python tests/vectors/generate.py  (rewrites reference_vectors.json)
"""

import json
import os

STRING_PADDING = 1  # reference main.rs:12
MAX_FIND_LENGTH = 255  # reference main.rs:20


def trim(v):
    """utils.rs:59-74 — strip leading/trailing empty strings."""
    v = list(v)
    while v and v[0] == "":
        v.pop(0)
    while v and v[-1] == "":
        v.pop()
    return v


def rsplit_all(s, pat):
    return list(reversed(s.split(pat)))


def rsplit_terminator(s, pat):
    parts = s.split(pat)
    if parts and parts[-1] == "":
        parts.pop()
    return list(reversed(parts))


def split_terminator(s, pat):
    parts = s.split(pat)
    if parts and parts[-1] == "":
        parts.pop()
    return parts


def split_inclusive(s, pat):
    """Rust split_inclusive: delimiter kept at the end of each piece."""
    parts = []
    cur = ""
    i = 0
    while i < len(s):
        if s.startswith(pat, i):
            parts.append(cur + pat)
            cur = ""
            i += len(pat)
        else:
            cur += s[i]
            i += 1
    if cur:
        parts.append(cur)
    return parts


def rsplitn(s, n, pat):
    """Rust rsplitn: at most n pieces, scanning from the end."""
    if n == 0:
        return []
    parts = s.rsplit(pat, n - 1)
    return list(reversed(parts))


def splitn(s, n, pat):
    if n == 0:
        return []
    return s.split(pat, n - 1)


V = []


def vec(name, ref, method, expected, **inputs):
    V.append({"name": name, "ref": f"main.rs:{ref}", "method": method,
              "inputs": inputs, "expected": expected})


def char(v):
    return {"kind": "char", "value": int(v)}


def string(v):
    return {"kind": "string", "value": v}


def split_exp(parts, found=1):
    return {"kind": "split", "parts": trim(parts), "found": int(found)}


def strip_exp(s, found):
    return {"kind": "strip", "value": s, "found": int(found)}


# --- predicates ------------------------------------------------------------
vec("valid_contains", "139-155", "contains",
    char("zama" in "awesomezamaisawesome"),
    string="awesomezamaisawesome", padding=3, pattern="zama")
vec("invalid_contains", "157-174", "contains",
    char("zama" in "hello world"),
    string="hello world", padding=3, pattern="zama")
vec("invalid_ends_with", "176-197", "ends_with",
    char("hello world".endswith("zama")),
    string="hello world", padding=STRING_PADDING, pattern="zama")
vec("valid_starts_with", "199-220", "starts_with",
    char("hello world".startswith("hello")),
    string="hello world", padding=STRING_PADDING, pattern="hello")
vec("invalid_starts_with", "222-243", "starts_with",
    char("hello world".startswith("zama")),
    string="hello world", padding=STRING_PADDING, pattern="zama")
vec("valid_ends_with", "245-266", "ends_with",
    char("hello world".endswith("world")),
    string="hello world", padding=STRING_PADDING, pattern="world")
vec("is_empty", "486-506", "is_empty", char("" == ""),
    string="", padding=STRING_PADDING)
vec("is_not_empty", "508-527", "is_empty", char("hello" == ""),
    string="hello", padding=STRING_PADDING)
vec("eq", "630-662", "eq", char("hello test" == "hello test"),
    string="hello test", padding=STRING_PADDING,
    string2="hello test", padding2=STRING_PADDING + 20)
vec("eq_ignore_case", "664-696", "eq_ignore_case",
    char("hello TEST".lower() == "hello test".lower()),
    string="hello TEST", padding=STRING_PADDING,
    string2="hello test", padding2=STRING_PADDING + 20)
vec("less_than", "818-843", "lt", char("aaa" < "aaaa"),
    string="aaa", padding=STRING_PADDING,
    string2="aaaa", padding2=STRING_PADDING)
vec("less_equal", "845-870", "le", char("aaa" <= "aaaa"),
    string="aaa", padding=STRING_PADDING,
    string2="aaaa", padding2=STRING_PADDING)
vec("greater_than", "872-897", "gt", char("aaa" > "aaaa"),
    string="aaa", padding=STRING_PADDING,
    string2="aaaa", padding2=STRING_PADDING)
vec("greater_equal", "899-924", "ge", char("aaa" >= "aaaa"),
    string="aaa", padding=STRING_PADDING,
    string2="aaaa", padding2=STRING_PADDING)

# --- index -----------------------------------------------------------------
vec("len", "529-548", "len", char(len("hello world")),
    string="hello world", padding=STRING_PADDING)
vec("rfind", "550-568", "rfind", char("hello abc abc test".rfind("abc")),
    string="hello abc abc test", padding=STRING_PADDING, pattern="abc")
vec("invalid_rfind", "570-592", "rfind", char(MAX_FIND_LENGTH),
    string="hello test", padding=STRING_PADDING, pattern="abc")
vec("unsupported_size_rfind", "594-611", "rfind",
    {"kind": "panic", "message": "Maximum supported size for find reached"},
    string="hello test" * 100, padding=STRING_PADDING, pattern="abc")
vec("find", "613-628", "find", char("hello test".find("test")),
    string="hello test", padding=STRING_PADDING, pattern="test")

# --- rewriting -------------------------------------------------------------
vec("uppercase", "268-285", "to_upper",
    string("zama IS awesome".upper()),
    string="zama IS awesome", padding=STRING_PADDING)
vec("lowercase", "383-404", "to_lower",
    string("zama IS awesome".lower()),
    string="zama IS awesome", padding=STRING_PADDING)
vec("repeat", "287-306", "repeat", string("abc" * 3),
    string="abc", padding=STRING_PADDING, n=3)
vec("replace1", "308-331", "replace",
    string("hello world world test".replace("world", "abc")),
    string="hello world world test", padding=STRING_PADDING,
    frm="world", to="abc")
vec("replace2", "333-356", "replace",
    string("hello abc abc test".replace("abc", "world")),
    string="hello abc abc test", padding=STRING_PADDING,
    frm="abc", to="world")
vec("replacen", "358-381", "replacen",
    string("hello abc abc test".replace("abc", "world", 1)),
    string="hello abc abc test", padding=STRING_PADDING,
    frm="abc", to="world", n=1)
vec("trim_end", "406-424", "trim_end", string("ZA MA\n\t \r\x0c".rstrip()),
    string="ZA MA\n\t \r\x0c", padding=STRING_PADDING)
vec("do_not_trim_end", "426-444", "trim_end", string("\nZA MA".rstrip()),
    string="\nZA MA", padding=STRING_PADDING)
vec("trim_start", "446-464", "trim_start", string("\nZA MA".lstrip()),
    string="\nZA MA", padding=STRING_PADDING)
vec("trim", "466-484", "trim", string("\nZA MA\n".strip()),
    string="\nZA MA\n", padding=STRING_PADDING)
vec("concatenate", "792-816", "concatenate", string("Hello, " + "World!"),
    string="Hello, ", padding=STRING_PADDING,
    string2="World!", padding2=STRING_PADDING)

# --- strip -----------------------------------------------------------------
vec("strip_prefix", "698-720", "strip_prefix",
    strip_exp("HELLO test test HELLO"[len("HELLO"):], 1),
    string="HELLO test test HELLO", padding=STRING_PADDING, pattern="HELLO")
vec("strip_suffix", "722-744", "strip_suffix",
    strip_exp("HELLO test test HELLO"[:-len("HELLO")], 1),
    string="HELLO test test HELLO", padding=STRING_PADDING, pattern="HELLO")
vec("dont_strip_suffix", "746-769", "strip_suffix",
    strip_exp("HELLO test test HELLO", 0),
    string="HELLO test test HELLO", padding=STRING_PADDING, pattern="WORLD")
vec("dont_strip_prefix", "771-790", "strip_prefix",
    strip_exp("HELLO test test HELLO", 0),
    string="HELLO test test HELLO", padding=STRING_PADDING, pattern="WORLD")

# --- split family ----------------------------------------------------------
vec("split", "926-951", "split",
    split_exp(" Mary had a".split(" ")),
    string=" Mary had a", padding=STRING_PADDING, pattern=" ")
vec("split_inclusive", "953-977", "split_inclusive",
    split_exp(split_inclusive("Mary had a", " ")),
    string="Mary had a", padding=STRING_PADDING, pattern=" ")
vec("split_terminator", "979-1003", "split_terminator",
    split_exp(split_terminator(".A.B.", ".")),
    string=".A.B.", padding=STRING_PADDING, pattern=".")
vec("split_ascii_whitespace", "1005-1026", "split_ascii_whitespace",
    split_exp(" A\nB\t".split()),
    string=" A\nB\t", padding=STRING_PADDING)
vec("splitn", "1028-1056", "splitn",
    split_exp(splitn(".A.B.C.", 2, ".")),
    string=".A.B.C.", padding=STRING_PADDING, pattern=".", n=2)
vec("rsplit", "1058-1082", "rsplit",
    split_exp(rsplit_all(".A.B.C.", ".")),
    string=".A.B.C.", padding=STRING_PADDING, pattern=".")
vec("rsplit_once", "1084-1109", "rsplit_once",
    split_exp([".A.B.C.".rsplit(".", 1)[1], ".A.B.C.".rsplit(".", 1)[0]]),
    string=".A.B.C.", padding=STRING_PADDING, pattern=".")
vec("rsplitn", "1111-1139", "rsplitn",
    split_exp(rsplitn(".A.B.C.", 3, ".")),
    string=".A.B.C.", padding=STRING_PADDING, pattern=".", n=3)
vec("rsplit_terminator", "1141-1164", "rsplit_terminator",
    split_exp(rsplit_terminator("....A.B.C.", ".")),
    string="....A.B.C.", padding=STRING_PADDING, pattern=".")


def main():
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "reference_vectors.json")
    with open(out, "w") as f:
        json.dump(V, f, indent=1, ensure_ascii=True)
        f.write("\n")
    print(f"wrote {len(V)} vectors to {out}")


if __name__ == "__main__":
    main()
