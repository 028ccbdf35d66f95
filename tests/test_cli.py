"""Drive the CLI entry point end-to-end (argparse → pipeline → JSONL
sinks) with the network/codec stages monkeypatched to offline doubles."""

from __future__ import annotations

import json

import ethiopia_legal_etl_spark.operators.ingest as ingest_mod
from ethiopia_legal_etl_spark.cli import main

BASE = "https://fsc.example.et/files"


def test_cli_ingest_end_to_end(spark, tmp_path, monkeypatch):
    links_file = tmp_path / "pdf_links.json"
    links_file.write_text(json.dumps([f"{BASE}/vol01.pdf", f"{BASE}/broken.pdf"]))

    def fetcher(url):
        if "broken" in url:
            raise ConnectionError("nope")
        return 200, "application/pdf", b"%PDF-X"

    monkeypatch.setattr(ingest_mod, "default_fetcher", fetcher)
    monkeypatch.setattr(
        ingest_mod, "default_extractor", lambda body: ["ውሳኔ 1999", "ገጽ"]
    )

    out = str(tmp_path / "docs")
    rej = str(tmp_path / "rejects")
    rc = main(
        [
            "ingest",
            "--links", str(links_file),
            "--out", out,
            "--rejects", rej,
            "--partitions", "2",
        ]
    )
    assert rc == 0

    docs = [json.loads(line) for line in _read_jsonl(out)]
    assert len(docs) == 1
    assert docs[0]["title"] == "vol01"
    assert docs[0]["year"] == "1999"
    assert docs[0]["content"] == "ውሳኔ 1999\nገጽ"

    rejects = [json.loads(line) for line in _read_jsonl(rej)]
    assert len(rejects) == 1
    assert rejects[0]["url"].endswith("broken.pdf")
    assert rejects[0]["error"].startswith("ConnectionError")


def _read_jsonl(d: str):
    import glob

    lines = []
    for f in glob.glob(f"{d}/part-*"):
        lines += [ln for ln in open(f) if ln.strip()]
    return lines
