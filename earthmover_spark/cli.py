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
        help="enable hashing + skip (exit 99) even without a config "
             "`state_file` (hashing is on by default when one is set)",
    )
    run_p.add_argument(
        "-f", "--force", action="store_true",
        help="force regeneration even if data and configs have not changed "
             "(still logs the run)",
    )
    run_p.add_argument(
        "-k", "--skip-hashing", action="store_true",
        help="skip computing input hashes for change detection and prevent "
             "the run-log write",
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

    init_p = sub.add_parser(
        "init",
        help="scaffold a runnable starter project (README, earthmover.yaml, "
             "sources, templates) — the reference's `earthmover init`",
    )
    init_p.add_argument(
        "name", nargs="?", default=None,
        help="project directory name (prompted interactively if omitted)",
    )

    comp_p = sub.add_parser("compile", help="compile only; print the plan")
    comp_p.add_argument("-c", "--config", required=True)
    comp_p.add_argument("-p", "--params", default=None)
    comp_p.add_argument(
        "--to-disk", action="store_true",
        help="also write the merged, Jinja-expanded YAML next to the config",
    )

    exp_p = sub.add_parser(
        "explain",
        help="compile and print each destination's physical plan "
             "without writing anything (plan-tuning surface)",
    )
    exp_p.add_argument("-c", "--config", required=True)
    exp_p.add_argument("-p", "--params", default=None)
    exp_p.add_argument("-s", "--select", default="*")
    exp_p.add_argument(
        "--mode", default="formatted",
        choices=["simple", "extended", "formatted", "cost", "codegen"],
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

    if args.command == "init":
        from earthmover_spark.scaffold import run_init
        from earthmover_spark.util import EarthmoverSparkError

        try:
            path = run_init(args.name)
        except EarthmoverSparkError as err:
            print(f"ERROR: {err}")
            return 1
        print(
            "Successfully initialized new project! You can test it out by "
            f"running:\n\ncd {path}\npython -m earthmover_spark run -c earthmover.yaml\n"
        )
        return 0

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

    if args.command == "explain":
        from earthmover_spark import get_spark
        from earthmover_spark.plans.executor import explain_project

        spark = get_spark("earthmover_spark.explain")
        for dest, plan in explain_project(
            spark, args.config, params, selector=args.select, mode=args.mode
        ).items():
            print(f"==== {dest} ====")
            print(plan)
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
        force=args.force,
        skip_hashing=args.skip_hashing,
    )
    if "__skipped__" in results:
        print(f"skipping run: {results['__skipped__']}")
        return 99
    for dest, path in results.items():
        print(f"{dest} -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
