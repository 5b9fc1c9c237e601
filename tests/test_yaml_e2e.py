"""End-to-end YAML project test, modeled on the reference's golden-file
suite (earthmover -t; SURVEY.md §5): animal CSVs -> union + snake_case +
distinct -> join zoos via inventories -> group_by -> Jinja destination.

Fixture schemas follow FIXTURES.md (own synthetic data, not copied).
Comparison is order-insensitive sorted-line equality, like the
reference's test harness (earthmover/earthmover.py:432-448).
"""

import json
import os
import textwrap

import pytest


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("zoo_project")
    (d / "sources").mkdir()
    # PascalCase headers exercise snake_case_columns
    (d / "sources" / "mammals.csv").write_text(
        "ID,Name,Genus,AvgLifespanYrs,AvgWeightKg\n"
        "1,Capuchin,Cebus,25,3.9\n"
        "2,Red Fox,Vulpes,5,6.2\n"
        "3,Sea Otter,Enhydra,12,30\n"
    )
    # snake_case but different column order exercises union-by-name
    (d / "sources" / "birds.csv").write_text(
        "name,genus,avg_lifespan_yrs,avg_weight_kg,id\n"
        "Barn Owl,Tyto,4,0.5,1\n"
        "Emu,Dromaius,10,40,2\n"
        "Emu,Dromaius,10,40,2\n"  # duplicate row exercises distinct_rows
    )
    (d / "sources" / "zoos.csv").write_text(
        "id,name,city,date_founded\n"
        "1,Alpha Zoo,Springfield,Jan 1 1875\n"
        "2,Beta Park,Shelbyville,Jun 15 1952\n"
    )
    (d / "sources" / "inventories.csv").write_text(
        "zoo,animal,count\n"
        "1,m_1,10\n"
        "1,b_2,4\n"
        "2,m_3,2\n"
        "2,b_1,6\n"
        "2,m_1,1\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          mammals:
            file: sources/mammals.csv
          birds:
            file: sources/birds.csv
          zoos:
            file: sources/zoos.csv
          inventories:
            file: sources/inventories.csv

        transformations:
          mammals_clean:
            source: $sources.mammals
            operations:
              - operation: snake_case_columns
              - operation: add_columns
                columns:
                  animal_id: "{%raw%}m_{{id}}{%endraw%}"
          birds_clean:
            source: $sources.birds
            operations:
              - operation: distinct_rows
              - operation: add_columns
                columns:
                  animal_id: "{%raw%}b_{{id}}{%endraw%}"
          animals:
            source: $transformations.mammals_clean
            operations:
              - operation: union
                sources:
                  - $transformations.birds_clean
              - operation: keep_columns
                columns: [animal_id, name, genus, avg_lifespan_yrs]
          zoos_clean:
            source: $sources.zoos
            operations:
              - operation: date_format
                column: date_founded
                from_format: "%b %d %Y"
                to_format: "%Y-%m-%d"
              - operation: rename_columns
                columns: {id: zoo_id, name: zoo_name}
          stock:
            source: $sources.inventories
            operations:
              - operation: join
                sources: [$transformations.animals]
                join_type: inner
                left_key: animal
                right_key: animal_id
              - operation: join
                sources: [$transformations.zoos_clean]
                join_type: inner
                left_key: zoo
                right_key: zoo_id
              - operation: filter_rows
                query: 'count.str.contains("^[0-9]+$")'
                behavior: include
          totals:
            source: $transformations.stock
            operations:
              - operation: group_by
                group_by_columns: [zoo_name]
                create_columns:
                  n_species: count()
                  total_count: sum(count)
                  names: agg(name,;)

        destinations:
          stock_lines:
            source: $transformations.stock
            extension: jsonl
          zoo_totals:
            source: $transformations.totals
            template: templates/totals.jsont
            extension: jsonl
    """))
    (d / "templates").mkdir()
    (d / "templates" / "totals.jsont").write_text(
        '{"zoo": "{{zoo_name}}", "species": {{n_species}}, '
        '"animals": {{total_count|int}}, "names": "{{names}}"}'
    )
    return d


def test_yaml_project_end_to_end(spark, project_dir):
    from earthmover_spark.plans.executor import run_project

    results = run_project(spark, str(project_dir / "earthmover.yaml"))
    totals_path = results["$destinations.zoo_totals"]
    lines = sorted(open(totals_path).read().splitlines())
    parsed = [json.loads(ln) for ln in lines]
    by_zoo = {p["zoo"]: p for p in parsed}
    assert set(by_zoo) == {"Alpha Zoo", "Beta Park"}
    assert by_zoo["Alpha Zoo"]["species"] == 2
    assert by_zoo["Alpha Zoo"]["animals"] == 14  # 10 + 4
    assert by_zoo["Beta Park"]["animals"] == 9  # 2 + 6 + 1
    assert by_zoo["Beta Park"]["species"] == 3
    # ordered agg: input order Sea Otter, Barn Owl, Capuchin per inventories
    assert set(by_zoo["Beta Park"]["names"].split(";")) == {
        "Sea Otter", "Barn Owl", "Capuchin"
    }

    stock_path = results["$destinations.stock_lines"]
    stock = [json.loads(ln) for ln in open(stock_path)]
    assert len(stock) == 5
    row = next(r for r in stock if r["animal"] == "m_3")
    assert row["date_founded"] == "1952-06-15"
    assert row["genus"] == "Enhydra"
    # all-string model: every JSON value is a string
    assert all(isinstance(v, str) for r in stock for v in r.values())


def test_sourceless_transformation_with_op_sources(spark, tmp_path):
    """A transformation with no `source:` whose first op carries
    op-level `sources` passes validation AND runs: the first source is
    taken as the left frame (multi-source fold semantics)."""
    from earthmover_spark.plans.executor import run_project

    (tmp_path / "sources").mkdir()
    (tmp_path / "sources" / "a.csv").write_text("id,v\n1,x\n")
    (tmp_path / "sources" / "b.csv").write_text("id,v\n2,y\n")
    (tmp_path / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs
        sources:
          a: {file: sources/a.csv}
          b: {file: sources/b.csv}
        transformations:
          both:
            operations:
              - operation: union
                sources: [$sources.a, $sources.b]
        destinations:
          out:
            source: $transformations.both
            extension: jsonl
    """))
    results = run_project(spark, str(tmp_path / "earthmover.yaml"))
    rows = [json.loads(ln) for ln in open(results["$destinations.out"])]
    assert {(r["id"], r["v"]) for r in rows} == {("1", "x"), ("2", "y")}


def test_compile_only(project_dir):
    from earthmover_spark.plans.config import compile_config
    from earthmover_spark.plans.graph import Graph

    project = compile_config(str(project_dir / "earthmover.yaml"))
    graph = Graph(project)
    order = graph.topological_order()
    assert order.index("$sources.mammals") < order.index(
        "$transformations.mammals_clean"
    )
    assert order[-1].startswith("$destinations.")


def test_selector_subgraph(project_dir):
    from earthmover_spark.plans.config import compile_config
    from earthmover_spark.plans.graph import Graph

    graph = Graph(compile_config(str(project_dir / "earthmover.yaml")))
    subset = graph.select("*zoo_totals")
    assert "$destinations.zoo_totals" in subset
    assert "$destinations.stock_lines" not in subset
    # ancestors included
    assert "$sources.mammals" in subset


def test_expect_failure(spark, project_dir, tmp_path):
    from earthmover_spark.plans.executor import run_project
    from earthmover_spark.util import EarthmoverSparkError

    original = (project_dir / "earthmover.yaml").read_text()
    target = "  zoos_clean:\n    source: $sources.zoos\n"
    assert target in original
    yaml_text = original.replace(
        target,
        '  zoos_clean:\n    source: $sources.zoos\n    expect:\n'
        '      - "{%raw%}zoo_id|int > 1{%endraw%}"\n',
    )
    cfg = tmp_path / "bad.yaml"
    cfg.write_text(yaml_text)
    import shutil

    shutil.copytree(project_dir / "sources", tmp_path / "sources")
    shutil.copytree(project_dir / "templates", tmp_path / "templates")
    with pytest.raises(EarthmoverSparkError, match="expectation"):
        run_project(spark, str(cfg))


def test_skip_if_unchanged(spark, project_dir, tmp_path):
    """Runs-file incremental skip (reference runs_file.py): second run
    with identical inputs is skipped; changing a source file or params
    re-runs."""
    from earthmover_spark.plans.executor import run_project

    out1 = str(tmp_path / "o1")
    runs = str(tmp_path / "runs.csv")
    cfg = str(project_dir / "earthmover.yaml")

    r1 = run_project(spark, cfg, output_dir=out1, skip_if_unchanged=True,
                     runs_file=runs)
    assert "__skipped__" not in r1 and r1

    r2 = run_project(spark, cfg, output_dir=out1, skip_if_unchanged=True,
                     runs_file=runs)
    assert "__skipped__" in r2

    # different params -> no skip
    r3 = run_project(spark, cfg, params={"X": "1"}, output_dir=out1,
                     skip_if_unchanged=True, runs_file=runs)
    assert "__skipped__" not in r3

    # touching a source file's content -> no skip
    src = project_dir / "sources" / "zoos.csv"
    src.write_text(src.read_text() + "3,Gamma Zoo,Ogdenville,Feb 2 2001\n")
    r4 = run_project(spark, cfg, output_dir=out1, skip_if_unchanged=True,
                     runs_file=runs)
    assert "__skipped__" not in r4
    # and the new state is recorded: immediate re-run skips again
    r5 = run_project(spark, cfg, output_dir=out1, skip_if_unchanged=True,
                     runs_file=runs)
    assert "__skipped__" in r5
