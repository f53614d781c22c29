"""CLI mirroring the reference bin/gpml2pvjson (stdin GPML → ndjson pvjson)
plus the distributed pages pipeline.

Usage:
  python -m gpml2pvjson_js_ray convert [--id IRI] [--pathway-version V]
      < concatenated.gpml > out.ndjson
  python -m gpml2pvjson_js_ray run --pages DIR --out DIR [--num-cpus N]

`convert` is single-process (one document at a time, exactly the reference
CLI's semantics incl. the multi-document splitter and sha256 fallback id,
bin/gpml2pvjson:61-121); `run` owns a Ray session and executes the full
resumable KG pipeline.
"""

from __future__ import annotations

import argparse
import json
import sys


def _stdin_chunks(chunk_size: int = 65536):
    """Chunked stdin reader: the CLI streams its input like the reference's
    highland pipeline (bin/gpml2pvjson:61-96) instead of slurping — a
    throttled/chunked feed converts document-by-document with bounded
    memory."""
    while True:
        chunk = sys.stdin.read(chunk_size)
        if not chunk:
            return
        yield chunk


def cmd_convert(args) -> int:
    from .functions.convert import (ConversionError, convert_island,
                                    sha256_island_id)
    from .functions.islands import iter_split_gpml_stream

    from .functions.profile import PROFILES
    profile = PROFILES[getattr(args, "profile", "gpml2013a")]
    for island in iter_split_gpml_stream(_stdin_chunks()):
        try:
            doc = convert_island(island, pathway_iri=args.id,
                                 profile=profile)
        except ConversionError as exc:
            print(str(exc), file=sys.stderr)
            return 1  # reference CLI exits non-zero on conversion errors
        if not doc["pathway"].get("id"):
            doc["pathway"]["id"] = sha256_island_id(island)
        if args.pathway_version:
            doc["pathway"]["pathwayVersion"] = args.pathway_version
        sys.stdout.write(json.dumps(doc, separators=(",", ":")) + "\n")
    return 0


def cmd_run(args) -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        from .pipelines.kg import run_kg_pipeline
        stats = run_kg_pipeline(args.pages, args.out,
                                resume=not args.no_resume)
        print(json.dumps(stats))
    finally:
        ray.shutdown()
    return 0


def cmd_jsonld(args) -> int:
    """Materialize JSON-LD ndjson documents from a docs parquet directory
    (S6 ndjson sink parity)."""
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        import ray.data as rd
        docs = rd.read_parquet(args.docs, columns=["pvjson", "error"])
        with open(args.out, "w") as f:
            for batch in docs.iter_batches(batch_size=1024,
                                           batch_format="pyarrow"):
                for blob, err in zip(batch.column("pvjson").to_pylist(),
                                     batch.column("error").to_pylist()):
                    if not err and blob:
                        f.write(blob + "\n")
    finally:
        ray.shutdown()
    return 0


def cmd_ntriples(args) -> int:
    """Export the pages corpus's deduped triples as sharded N-Triples
    (the RDF bulk-load sink; see functions/ntriples.py for the
    term-mapping convention)."""
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        from .pipelines.kg import read_pages, write_ntriples
        manifest = write_ntriples(read_pages(args.pages), args.out,
                                  quads=args.quads)
        shards = manifest.to_pandas()
        print(json.dumps({"shards": len(shards),
                          "triples": int(shards["n_triples"].sum()),
                          "out": args.out}))
    finally:
        ray.shutdown()
    return 0


def cmd_compare(args) -> int:
    """Distributed regression-compare harness: convert every GPML file
    in --gpml and field-diff it against the same-stem golden JSON in
    --expected (the reference's compare-streaming.js workflow,
    test/compare/compare-streaming.js:1-769, re-expressed as a Ray
    Dataset map over the corpus).

    Prints one ndjson line per compared file plus a final summary line;
    exits 1 if any file has diffs (or is missing its golden)."""
    import glob as _glob
    import os

    import ray

    owned = not ray.is_initialized()
    if owned:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        import ray.data as rd

        pairs = []
        for path in sorted(_glob.glob(os.path.join(args.gpml, "*.gpml"))):
            stem = os.path.splitext(os.path.basename(path))[0]
            pairs.append({
                "name": stem,
                "gpml_path": path,
                "expected_path": os.path.join(args.expected,
                                              f"{stem}.json")})
        if not pairs:
            print(f"no .gpml files under {args.gpml}", file=sys.stderr)
            return 1

        def compare_batch(batch):
            # one conversion per document — the per-row loop IS the unit
            # of work here (cpu-bound convert), not a vectorizable kernel
            from .functions.convert import convert_island
            from .functions.diffing import diff_documents
            out = {"name": [], "n_entities": [], "n_diffs": [],
                   "error": [], "first_diffs": []}
            for name, gp, xp in zip(batch["name"], batch["gpml_path"],
                                    batch["expected_path"]):
                err, diffs, n_ents = "", [], 0
                try:
                    with open(xp) as f:
                        expected = json.load(f)
                except OSError:
                    err = "missing-golden"
                    expected = None
                if expected is not None:
                    try:
                        with open(gp) as f:
                            mine = convert_island(f.read())
                        n_ents = len(mine.get("entitiesById", {}))
                        diffs = diff_documents(mine, expected)
                    except Exception as exc:
                        err = f"convert-failed: {exc}"
                out["name"].append(name)
                out["n_entities"].append(n_ents)
                out["n_diffs"].append(len(diffs))
                out["error"].append(err)
                out["first_diffs"].append(json.dumps(diffs[:5]))
            return out

        results = (rd.from_items(pairs)
                   .map_batches(compare_batch, batch_size=8)
                   .sort("name"))
        total = bad = 0
        for row in results.iter_rows():
            total += 1
            if row["n_diffs"] or row["error"]:
                bad += 1
            line = {k: row[k] for k in ("name", "n_entities", "n_diffs",
                                        "error")}
            if row["n_diffs"]:
                line["first_diffs"] = json.loads(row["first_diffs"])
            print(json.dumps(line))
        print(json.dumps({"compared": total, "clean": total - bad,
                          "with_diffs_or_errors": bad}))
        return 1 if bad else 0
    finally:
        if owned:
            ray.shutdown()


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="gpml2pvjson_js_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_convert = sub.add_parser("convert", help="stdin GPML → ndjson pvjson")
    p_convert.add_argument("--id", default=None,
                           help="pathway IRI (else sha256 fallback)")
    p_convert.add_argument("--pathway-version", default=None)
    p_convert.add_argument("--profile", default="gpml2013a",
                           choices=["gpml2013a", "gpml2021"],
                           help="schema profile (functions/profile.py)")
    p_convert.set_defaults(fn=cmd_convert)

    p_run = sub.add_parser("run", help="distributed pages → KG pipeline")
    p_run.add_argument("--pages", required=True)
    p_run.add_argument("--out", required=True)
    p_run.add_argument("--num-cpus", type=int, default=32)
    p_run.add_argument("--no-resume", action="store_true")
    p_run.set_defaults(fn=cmd_run)

    p_jsonld = sub.add_parser("jsonld", help="docs parquet → ndjson JSON-LD")
    p_jsonld.add_argument("--docs", required=True)
    p_jsonld.add_argument("--out", required=True)
    p_jsonld.add_argument("--num-cpus", type=int, default=8)
    p_jsonld.set_defaults(fn=cmd_jsonld)

    p_nt = sub.add_parser(
        "ntriples", help="pages corpus → sharded N-Triples export")
    p_nt.add_argument("--pages", required=True)
    p_nt.add_argument("--out", required=True)
    p_nt.add_argument("--quads", action="store_true",
                      help="N-Quads with the crawl URL as graph label "
                           "(pre-dedup provenance)")
    p_nt.add_argument("--num-cpus", type=int, default=8)
    p_nt.set_defaults(fn=cmd_ntriples)

    p_cmp = sub.add_parser(
        "compare", help="regression-compare GPML corpus vs golden JSON")
    p_cmp.add_argument("--gpml", required=True,
                       help="directory of <name>.gpml inputs")
    p_cmp.add_argument("--expected", required=True,
                       help="directory of <name>.json goldens")
    p_cmp.add_argument("--num-cpus", type=int, default=8)
    p_cmp.set_defaults(fn=cmd_compare)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
