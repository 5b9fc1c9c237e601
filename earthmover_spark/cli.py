"""CLI: ``python -m earthmover_spark run|compile -c project.yaml``
(reference: earthmover/__main__.py)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    from earthmover_spark import __version__

    parser = argparse.ArgumentParser(prog="earthmover_spark")
    parser.add_argument(
        "-v", "--version", action="version",
        version=f"earthmover_spark {__version__}",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    run_p = sub.add_parser("run", help="compile + execute a project")
    run_p.add_argument("-c", "--config", required=True)
    run_p.add_argument("-p", "--params", default=None, help="JSON dict of ${VAR} params")
    run_p.add_argument("-s", "--select", default="*", help="node selector (wildcards)")
    run_p.add_argument("-o", "--output-dir", default=None)
    run_p.add_argument(
        "--skip-if-unchanged",
        action="store_true",
        help="skip the run (exit 99) when all input hashes match a prior run",
    )
    run_p.add_argument(
        "--results-file", default=None,
        help="write per-node row counts and timings as JSON",
    )
    run_p.add_argument(
        "-g", "--show-graph", action="store_true",
        help="write the node DAG as Graphviz DOT next to the outputs "
             "(with row counts when --results-file is also set)",
    )
    run_p.add_argument(
        "--set", nargs="*", default=None, dest="set_pairs", metavar="PATH VALUE",
        help="override config YAML settings by dotted path, e.g. "
             "--set config.log_level DEBUG sources.x.file /tmp/y.csv",
    )

    comp_p = sub.add_parser("compile", help="compile only; print the plan")
    comp_p.add_argument("-c", "--config", required=True)
    comp_p.add_argument("-p", "--params", default=None)
    comp_p.add_argument(
        "--to-disk", action="store_true",
        help="also write the merged, Jinja-expanded YAML next to the config",
    )

    deps_p = sub.add_parser(
        "deps",
        help="install project packages (git clone / local merge) without "
             "running — the reference's `earthmover deps`",
    )
    deps_p.add_argument("-c", "--config", required=True)
    deps_p.add_argument("-p", "--params", default=None)

    test_p = sub.add_parser(
        "test",
        help="run the project and compare each output to expected/<name> "
             "(sorted-line equality, like the reference's `earthmover -t`)",
    )
    test_p.add_argument("-c", "--config", required=True)
    test_p.add_argument("-p", "--params", default=None)
    test_p.add_argument(
        "-e", "--expected-dir", default=None,
        help="directory of golden files (default: <config dir>/expected)",
    )

    args = parser.parse_args(argv)
    params = json.loads(args.params) if args.params else None

    from earthmover_spark.plans.config import compile_config

    if args.command == "compile":
        project = compile_config(args.config, params)
        from earthmover_spark.plans.graph import Graph

        graph = Graph(project)
        for name in graph.topological_order():
            node = graph.nodes[name]
            ups = ", ".join(graph.parents[name]) or "-"
            print(f"{name}  <-  {ups}")
        if args.to_disk:
            from earthmover_spark.plans.config import compile_to_disk

            print(compile_to_disk(args.config, params))
        return 0

    if args.command == "deps":
        # compiling installs git packages and validates local ones
        project = compile_config(args.config, params)
        n = len(project.sources) + len(project.transformations) + len(
            project.destinations
        )
        print(f"packages installed; project compiles to {n} nodes")
        return 0

    if args.command == "test":
        from earthmover_spark import get_spark
        from earthmover_spark.plans.executor import run_golden_test

        spark = get_spark("earthmover_spark.test")
        failures = run_golden_test(
            spark, args.config, params, expected_dir=args.expected_dir
        )
        for name, msg in failures.items():
            print(f"FAIL {name}: {msg}")
        if failures:
            return 1
        print("all outputs match expected")
        return 0

    from earthmover_spark import get_spark
    from earthmover_spark.plans.executor import run_project

    overrides = None
    if getattr(args, "set_pairs", None):
        pairs = args.set_pairs
        if len(pairs) % 2:
            parser.error("--set expects PATH VALUE pairs")
        overrides = dict(zip(pairs[::2], pairs[1::2]))

    spark = get_spark("earthmover_spark.cli")
    results = run_project(
        spark,
        args.config,
        params,
        overrides=overrides,
        selector=args.select,
        output_dir=args.output_dir,
        skip_if_unchanged=args.skip_if_unchanged,
        results_file=args.results_file,
        show_graph=args.show_graph,
    )
    if "__skipped__" in results:
        print(f"skipping run: {results['__skipped__']}")
        return 99
    for dest, path in results.items():
        print(f"{dest} -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
