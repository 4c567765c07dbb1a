"""Foreign-format sources: the WARC-style record parser must be robust
to adversarial bodies (the oracle round-trips in test_queries only cover
the synthetic corpus)."""

import pandas as pd

from sparkcrawl.sources import _parse_warcish


def _record(doc_id: int, body: str) -> bytes:
    b = body.encode("utf-8")
    return (f"WARC/1.0\nWARC-Record-ID: {doc_id}\n"
            f"WARC-Target-URI: http://h/{doc_id}\n"
            f"Content-Length: {len(b)}\n\n").encode("utf-8") + b + b"\n"


def test_warc_parser_adversarial_bodies():
    bodies = {
        1: "plain body",
        2: "body with\n\nblank lines\nand trailing\n",
        3: "body containing WARC/1.0\nContent-Length: 999\n\nfake header",
        4: "",                          # empty body
        5: "unicode: café 中文",
    }
    blob = b"".join(_record(i, s) for i, s in bodies.items())
    out = pd.concat(_parse_warcish(iter([pd.DataFrame({"content": [blob]})])))
    got = dict(zip(out["doc_id"], out["body"]))
    assert got == bodies
    assert list(out["target_uri"]) == [f"http://h/{i}" for i in bodies]


def test_warc_parser_multiple_blobs_batch():
    """Records split across separate files (rows) parse independently."""
    frames = [pd.DataFrame({"content": [_record(1, "a"), _record(2, "bb")]}),
              pd.DataFrame({"content": [_record(3, "ccc")]})]
    out = pd.concat(_parse_warcish(iter(frames)))
    assert sorted(zip(out["doc_id"], out["body"])) == [
        (1, "a"), (2, "bb"), (3, "ccc")]


def test_scratch_dirs_deterministic(spark):
    """Repeated invocations must reuse ONE scratch location per
    (format, sf) — the mkdtemp-per-call behavior accumulated orphaned
    table copies in /tmp across bench/correctness runs."""
    import os

    from sparkcrawl.sources import (_SCRATCH_ROOT, _scratch, _sfslug,
                                    source_csv_roundtrip)

    sf = "/root/testdata/sf0.001"
    assert _scratch("pin_demo") == _scratch("pin_demo")
    assert _scratch("pin_demo").startswith(_SCRATCH_ROOT)

    source_csv_roundtrip(spark, sf).count()
    before = set(os.listdir(_SCRATCH_ROOT))
    source_csv_roundtrip(spark, sf).count()   # rerun: no new dirs
    after = set(os.listdir(_SCRATCH_ROOT))
    assert after == before
    assert f"csv_{_sfslug(sf)}" in after
