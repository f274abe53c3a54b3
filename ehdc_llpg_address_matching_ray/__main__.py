"""CLI surface — the reference's ``cmd/`` tools as one entry point.

Reference analogues: cmd/matcher-v2 (link/match flows), the import
commands (internal/import, S2/S3), and the corpus/query utilities this
engine adds.  Usage::

    python -m ehdc_llpg_address_matching_ray link    --pages P.parquet --out DIR [--from-html] [--checkpoint CK]
    python -m ehdc_llpg_address_matching_ray match   --sources S.parquet --gazetteer G.parquet --out DIR
    python -m ehdc_llpg_address_matching_ray query   NAME --sf-dir DIR [--out DIR | --limit N]
    python -m ehdc_llpg_address_matching_ray ingest  --path F.csv --source-type land_charges --out DIR [--format jsonl]
    python -m ehdc_llpg_address_matching_ray corpus  --out DIR [--entities N] [--seed S]

This module OWNS a Ray session (the one place in the package allowed
to): ``ray.init`` is guarded so an externally initialized session is
reused, and the session is shut down on exit so the next run starts
clean.  Results are written as partitioned parquet directories (one
file per block — resumable, never one giant file).
"""

from __future__ import annotations

import argparse
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        import os

        # honor RAY_ADDRESS (set by `ray job submit` / cluster launchers)
        # so the same CLI attaches to a running cluster; bare local runs
        # default to a private local session
        kwargs = {
            "address": os.environ.get("RAY_ADDRESS", "local"),
            "include_dashboard": False,
        }
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    return ray


def _emit(ds, out: str | None, limit: int) -> None:
    """Write a Dataset (or frame) to parquet, or print a head sample."""
    import pandas as pd

    import ray.data as rd

    if out:
        if not isinstance(ds, rd.Dataset):
            ds = rd.from_pandas(pd.DataFrame(ds))
        ds.write_parquet(out)
        print(f"wrote {out}")
    else:
        head = ds.limit(limit).to_pandas() if isinstance(ds, rd.Dataset) else ds.head(limit)
        print(head.to_string())


def _sink(ds, out: str | None) -> int:
    """Consume a result Dataset exactly once: stream it to parquet when
    ``--out`` is given (never materialized in the object store — the
    100-TB path) and count from the written files' metadata; otherwise
    just count."""
    import ray.data as rd

    if out:
        ds.write_parquet(out)
        return rd.read_parquet(out).count()  # parquet metadata, no re-read
    return ds.count()


def cmd_link(args) -> int:
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .config import PipelineConfig
    from .pipelines.linkage import run_linkage

    pages = rd.read_parquet(args.pages)
    out = run_linkage(
        pages,
        PipelineConfig(),
        from_html=args.from_html,
        checkpoint_dir=args.checkpoint,
    )
    n = _sink(out["fact"], args.out)
    print(f"linkage_fact rows={n}" + (f" -> {args.out}" if args.out else ""))
    ray.shutdown()
    return 0


def cmd_match(args) -> int:
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .config import PipelineConfig
    from .pipelines.match import run_match

    out = run_match(
        rd.read_parquet(args.sources),
        rd.read_parquet(args.gazetteer),
        PipelineConfig(),
        source_id=args.source_id,
        source_text=args.source_text,
        gaz_id=args.gaz_id,
        gaz_text=args.gaz_text,
    )
    n = _sink(out["matches"], args.out)
    print(f"matches rows={n}" + (f" -> {args.out}" if args.out else ""))
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    from .pipelines.queries import QUERIES

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; one of:\n  " + "\n  ".join(sorted(QUERIES)),
              file=sys.stderr)
        return 2
    ray = _ray_session(args.num_cpus)
    _emit(QUERIES[args.name](args.sf_dir), args.out, args.limit)
    ray.shutdown()
    return 0


def cmd_ingest(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .sources.ingest import read_source_csv, read_source_jsonl

    reader = read_source_jsonl if args.format == "jsonl" else read_source_csv
    n = _sink(reader(args.path, args.source_type), args.out)
    print(f"src_document rows={n}" + (f" -> {args.out}" if args.out else ""))
    ray.shutdown()
    return 0


def cmd_curate(args) -> int:
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .pipelines.curate import CurationConfig, run_curation, write_curated

    cfg = CurationConfig(
        keep_langs=tuple(args.langs.split(",")) if args.langs else None,
        neardup=not args.no_neardup,
        redact_pii=not args.no_pii,
    )
    curated = run_curation(rd.read_parquet(args.docs), cfg)
    counts = write_curated(curated, args.out)
    total = sum(counts.values())
    print(f"curated rows={total} " + " ".join(f"{k}={v}" for k, v in counts.items())
          + f" -> {args.out}")
    ray.shutdown()
    return 0


def cmd_corpus(args) -> int:
    # pure parquet generation — no Ray session needed
    from .sources.corpus import write_corpus

    d = write_corpus(args.out, n_entities=args.entities, seed=args.seed,
                     shards=args.shards)
    print(f"corpus -> {d}")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ehdc_llpg_address_matching_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--num-cpus", type=int, default=None)
        p.add_argument("--out", default=None)

    p = sub.add_parser("link", help="flagship linkage: pages parquet -> fact")
    common(p)
    p.add_argument("--pages", required=True)
    p.add_argument("--from-html", action="store_true")
    p.add_argument("--checkpoint", default=None)
    p.set_defaults(fn=cmd_link)

    p = sub.add_parser("match", help="two-table cascade: sources x gazetteer")
    common(p)
    p.add_argument("--sources", required=True)
    p.add_argument("--gazetteer", required=True)
    p.add_argument("--source-id", default="src_id")
    p.add_argument("--source-text", default="raw_address")
    p.add_argument("--gaz-id", default="uprn")
    p.add_argument("--gaz-text", default="full_address")
    p.set_defaults(fn=cmd_match)

    p = sub.add_parser("query", help="run a named operator query over an sf dir")
    common(p)
    p.add_argument("name")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--limit", type=int, default=20)
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser("ingest", help="CSV/JSONL source files -> src_document parquet")
    common(p)
    p.add_argument("--path", required=True)
    p.add_argument("--source-type", required=True)
    p.add_argument("--format", choices=["csv", "jsonl"], default="csv")
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("curate", help="training-data curation: quality -> dedup -> scrub -> split")
    p.add_argument("--docs", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--langs", default=None, help="comma-separated allow-list (default: all)")
    p.add_argument("--no-neardup", action="store_true")
    p.add_argument("--no-pii", action="store_true")
    p.set_defaults(fn=cmd_curate)

    p = sub.add_parser("corpus", help="generate the seeded synthetic corpus")
    p.add_argument("--out", required=True)
    p.add_argument("--entities", type=int, default=500)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--shards", type=int, default=4)
    p.set_defaults(fn=cmd_corpus)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
