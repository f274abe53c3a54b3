"""CLI entry point (python -m ehdc_llpg_address_matching_ray ...)."""

import subprocess
import sys


def _run(*argv):
    return subprocess.run(
        [sys.executable, "-m", "ehdc_llpg_address_matching_ray", *argv],
        capture_output=True,
        text=True,
        timeout=300,
    )


class TestCli:
    def test_corpus_and_help(self, tmp_path):
        out = _run("corpus", "--out", str(tmp_path / "c"), "--entities", "10")
        assert out.returncode == 0 and "corpus ->" in out.stdout
        h = _run("--help")
        assert h.returncode == 0
        for cmd in ("link", "match", "query", "ingest", "corpus"):
            assert cmd in h.stdout

    def test_query_unknown_name_lists_registry(self):
        out = _run("query", "definitely_not_a_query", "--num-cpus", "2")
        assert out.returncode == 2
        assert "normalize_docs" in out.stderr

    def test_query_runs_and_writes(self, tmp_path):
        dest = str(tmp_path / "out")
        out = _run(
            "query", "train_split", "--sf-dir", "/root/testdata/sf0.001",
            "--out", dest, "--num-cpus", "2",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        import pyarrow.parquet as pq

        t = pq.read_table(dest)
        assert t.num_rows == 500 and "split" in t.column_names

    def test_ingest_csv(self, tmp_path):
        f = tmp_path / "lc.csv"
        f.write_text(
            "Job,Filepath,Card Code,Address,UPRN,Easting,Northing\n"
            'J1,p/a.pdf,LC1,"4 Monks Orchard Road, Alton GU34 1AA",9,1.5,2.5\n'
        )
        dest = str(tmp_path / "src")
        out = _run(
            "ingest", "--path", str(f), "--source-type", "land_charges",
            "--out", dest, "--num-cpus", "2",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        import pyarrow.parquet as pq

        t = pq.read_table(dest).to_pydict()
        assert t["postcode_text"] == ["GU341AA"]
        assert t["easting_raw"] == [1.5]
