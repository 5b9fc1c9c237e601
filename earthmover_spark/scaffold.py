"""``init`` subcommand: scaffold a runnable starter project
(reference: earthmover/init.py:1-35, wired at __main__.py:140-142).

The reference copies a bundled starter_project (README, earthmover.yaml,
two CSVs, one template); we write an equivalent — but original —
starter inline: two CSV sources, a union + snake_case + add_columns
transformation, and a Jinja-template JSONL destination, so ``init``
then ``run`` works end-to-end with no edits.
"""

from __future__ import annotations

import os
from pathlib import Path

from earthmover_spark.util import EarthmoverSparkError

_README = """\
# {name}

A starter earthmover_spark project. Run it with:

    python -m earthmover_spark run -c earthmover.yaml

Outputs land in `./outputs/`. Edit `earthmover.yaml` to add sources,
transformations, and destinations; see the repo README for the full
operation list.
"""

_YAML = """\
config:
  output_dir: ./outputs

sources:
  mammals:
    file: sources/mammals.csv
    header_rows: 1
  fishes:
    file: sources/fishes.csv
    header_rows: 1

transformations:
  animals:
    source: $sources.mammals
    operations:
      - operation: union
        sources:
          - $sources.fishes
      - operation: snake_case_columns
      - operation: add_columns
        columns:
          kingdom: animalia

destinations:
  animals:
    source: $transformations.animals
    template: templates/animal.jsont
    extension: jsonl
    linearize: True
"""

_MAMMALS = """\
Id,Name,Family
1,pine marten,Mustelidae
2,least weasel,Mustelidae
3,red squirrel,Sciuridae
"""

_FISHES = """\
Id,Name,Family
10,brown trout,Salmonidae
11,arctic char,Salmonidae
12,northern pike,Esocidae
"""

_TEMPLATE = """\
{"id": "{{id}}", "name": "{{name}}", "family": "{{family}}", "kingdom": "{{kingdom}}"}
"""


def sanitize_project_name(name: str) -> str:
    """Keep alphanumerics, underscore, dash — the reference's
    sanitization rule (init.py:27-31)."""
    return "".join(c for c in name if c.isalnum() or c in "_-")


def populate_project(project_path: str | os.PathLike) -> Path:
    """Write the starter project; raises if the directory exists."""
    root = Path(project_path)
    root.mkdir(parents=True, exist_ok=False)
    name = root.name
    (root / "README.md").write_text(_README.format(name=name))
    (root / "earthmover.yaml").write_text(_YAML)
    (root / "sources").mkdir()
    (root / "sources" / "mammals.csv").write_text(_MAMMALS)
    (root / "sources" / "fishes.csv").write_text(_FISHES)
    (root / "templates").mkdir()
    (root / "templates" / "animal.jsont").write_text(_TEMPLATE)
    return root


def run_init(name: str | None = None, base_dir: str | None = None) -> Path:
    """Interactive when no name is given (like the reference's
    ``input()`` prompt); returns the created project path."""
    if name is None:
        name = input("Enter a name for your project: ")
    clean = sanitize_project_name(name)
    if not clean:
        raise EarthmoverSparkError(
            "entered name has no valid characters (alphanumeric, underscore, dash)"
        )
    target = Path(base_dir or os.getcwd()) / clean
    try:
        return populate_project(target)
    except FileExistsError:
        raise EarthmoverSparkError(
            f"a file or directory already exists at {target}"
        ) from None
