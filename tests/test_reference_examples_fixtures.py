"""Run the reference's three network-dependent example projects
UNMODIFIED against in-sandbox fixtures (r8 verdict item 8 — makes
example parity 14/14):

- 04_sqlalchemy: the public-postgres connection is redirected (via the
  engine's ``--set``-style dotted overrides, not by editing the
  project) to a local sqlite database holding the same ``xref`` table
  shape — exercising the real SqlSource path end-to-end.
- 05_ftp: a minimal in-process FTP server (USER/PASS/TYPE/PASV/RETR
  over loopback) serves the CSV; the project's ftp:// connection is
  redirected to it — exercising the real ftplib fetch + spool + CSV
  parse path.
- 07_filetypes: the four https downloads are redirected to local
  parquet/orc/csv/fwf fixtures with the same shapes — exercising ext
  dispatch, `type: orc` + positional `columns` rename, header CSV,
  and fixed-width colspec INFERENCE (the reference ignores the
  example's `colspec:` key — not in its accepted set — and infers
  boundaries from the data; reference source.py:277).
"""

import glob
import json
import os
import socket
import sqlite3
import threading

import pytest

EXAMPLES = "/root/reference/example_projects"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference checkout not available"
)


def _read_jsonl(path):
    rows = []
    for part in glob.glob(os.path.join(path, "part-*")) or [path]:
        if os.path.isfile(part):
            with open(part) as fh:
                rows += [json.loads(ln) for ln in fh.read().splitlines() if ln]
    return rows


def test_example_04_sqlalchemy_against_sqlite(spark, tmp_path, monkeypatch):
    from earthmover_spark.plans.executor import run_project

    monkeypatch.setenv("HOME", str(tmp_path))
    db = tmp_path / "rna.db"
    con = sqlite3.connect(str(db))
    con.execute("CREATE TABLE xref (upi TEXT, taxid INTEGER, ac TEXT)")
    con.executemany(
        "INSERT INTO xref VALUES (?, ?, ?)",
        [(f"URS{i:010d}", 9606 + i, f"AC{i:05d}") for i in range(25)],
    )
    con.commit()
    con.close()
    results = run_project(
        spark,
        os.path.join(EXAMPLES, "04_sqlalchemy", "earthmover.yaml"),
        overrides={"sources.rna.connection": f"sqlite:///{db}"},
        output_dir=str(tmp_path / "out"),
        force=True,
    )
    rows = _read_jsonl(results["$destinations.rna"])
    assert len(rows) == 20  # the project's own LIMIT 20
    assert rows[0].keys() == {"upi", "taxid", "ac"}
    assert {r["upi"] for r in rows} <= {f"URS{i:010d}" for i in range(25)}


class _MiniFtpServer(threading.Thread):
    """Single-client passive-mode FTP server: just enough protocol for
    ftplib's connect/login/retrbinary/quit sequence."""

    def __init__(self, root: str):
        super().__init__(daemon=True)
        self.root = root
        self.sock = socket.create_server(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]

    def run(self):
        conn, _ = self.sock.accept()
        f = conn.makefile("rwb")

        def send(line):
            f.write((line + "\r\n").encode())
            f.flush()

        send("220 mini ftp fixture")
        data_srv = None
        while True:
            raw = f.readline()
            if not raw:
                break
            cmd, _, arg = raw.decode().strip().partition(" ")
            cmd = cmd.upper()
            if cmd == "USER":
                send("331 password required")
            elif cmd == "PASS":
                send("230 logged in")
            elif cmd == "TYPE":
                send("200 type set")
            elif cmd == "PASV":
                data_srv = socket.create_server(("127.0.0.1", 0))
                p = data_srv.getsockname()[1]
                send(
                    f"227 Entering Passive Mode (127,0,0,1,{p >> 8},{p & 255})"
                )
            elif cmd == "RETR":
                path = os.path.join(self.root, os.path.basename(arg))
                if not os.path.exists(path):
                    send("550 not found")
                    continue
                send("150 opening data connection")
                d, _ = data_srv.accept()
                with open(path, "rb") as fp:
                    d.sendall(fp.read())
                d.close()
                data_srv.close()
                data_srv = None
                send("226 transfer complete")
            elif cmd == "QUIT":
                send("221 bye")
                break
            else:
                send("502 not implemented")
        conn.close()
        self.sock.close()


def test_example_05_ftp_against_local_server(spark, tmp_path, monkeypatch):
    from earthmover_spark.plans.executor import run_project

    monkeypatch.setenv("HOME", str(tmp_path))
    root = tmp_path / "ftp_root"
    root.mkdir()
    (root / "final2018rcc_puf.csv").write_text(
        "FACWT,CONTRACTSTF\n12.5,3\n7.25,0\n99.0,14\n"
    )
    srv = _MiniFtpServer(str(root))
    srv.start()
    results = run_project(
        spark,
        os.path.join(EXAMPLES, "05_ftp", "earthmover.yaml"),
        overrides={
            "sources.data.connection": (
                f"ftp://127.0.0.1:{srv.port}/final2018rcc_puf.csv"
            )
        },
        output_dir=str(tmp_path / "out"),
        force=True,
    )
    rows = _read_jsonl(results["$destinations.data"])
    assert len(rows) == 3
    assert {r["FACWT"] for r in rows} == {"12.5", "7.25", "99.0"}
    assert {r["CONTRACTSTF"] for r in rows} == {3, 0, 14}


def test_example_07_filetypes_against_local_files(spark, tmp_path, monkeypatch):
    from earthmover_spark.plans.executor import run_project

    monkeypatch.setenv("HOME", str(tmp_path))
    people = [
        (i, f"First{i}", f"Last{i}", f"u{i}@x.test", "F" if i % 2 else "M",
         f"10.0.0.{i}", f"cc{i}", "Ireland", f"19{50 + i}-01-01",
         1000.0 * i, "Engineer", "")
        for i in range(1, 9)
    ]
    cols13 = [
        "registration_dttm", "id", "first_name", "last_name", "email",
        "gender", "ip_address", "cc", "country", "birthdate", "salary",
        "title", "comments",
    ]

    # users1: parquet (normal column metadata)
    p1 = str(tmp_path / "userdata1.parquet")
    spark.createDataFrame(
        [(str(i), f"First{i}", f"Last{i}", "M" if i % 2 else "F", "France")
         for i in range(1, 6)],
        ["id", "first_name", "last_name", "gender", "country"],
    ).coalesce(1).write.parquet(p1)

    # users2: orc, renamed positionally by the project's `columns` list
    p2 = str(tmp_path / "userdata2_orc")
    spark.createDataFrame(
        [(f"2016-0{i}-01", str(i), f"First{i}", f"Last{i}", f"u{i}@x.test",
          "F", f"10.0.0.{i}", f"cc{i}", "Brazil", "1950-01-01",
          str(100.5 * i), "Analyst", "")
         for i in range(1, 5)],
        [f"_col{j}" for j in range(13)],  # headerless, as in the original
    ).coalesce(1).write.orc(p2)

    # users3: csv with one header row
    p3 = str(tmp_path / "userdata3.csv")
    with open(p3, "w") as fh:
        fh.write("id,first_name,last_name,gender,country\n")
        for i in range(1, 7):
            fh.write(f"{i},First{i},Last{i},O,Japan\n")

    # users4: fixed-width with colspecs INFERRED from the data (the
    # project's `colspec:` key is ignored, as in the reference)
    p4 = str(tmp_path / "datafile.fwf")
    with open(p4, "w") as fh:
        fh.write("Doe        John      1900 1980\n")
        fh.write("Smithson   Jane      1910 1995\n")
        fh.write("OConnor    Pat       1925 2001\n")

    results = run_project(
        spark,
        os.path.join(EXAMPLES, "07_filetypes", "earthmover.yaml"),
        overrides={
            "sources.users1.file": p1,
            "sources.users2.file": p2,
            "sources.users3.file": p3,
            "sources.users4.file": p4,
        },
        output_dir=str(tmp_path / "out"),
        force=True,
    )
    u1 = _read_jsonl(results["$destinations.users/1"])
    assert len(u1) == 5 and u1[0]["country"] == "France"
    u2 = _read_jsonl(results["$destinations.users/2"])
    assert len(u2) == 4
    assert {r["first_name"] for r in u2} == {f"First{i}" for i in range(1, 5)}
    u3 = _read_jsonl(results["$destinations.users/3"])
    assert len(u3) == 6 and {r["gender"] for r in u3} == {"O"}
    u4 = _read_jsonl(results["$destinations.users/4"])
    assert len(u4) == 3
    # last/first names came from the inferred fixed-width columns; the
    # id/gender/country columns were added by the Jinja transformation
    assert {r["last_name"] for r in u4} == {"Doe", "Smithson", "OConnor"}
    assert all(r["country"] == "United States" for r in u4)
    assert all(isinstance(r["id"], int) and 1 <= r["id"] < 10000 for r in u4)


def test_fixedwidth_colspec_inference_unit(spark, tmp_path):
    """Direct unit coverage for the inference path: blank-everywhere
    position runs separate columns; a count mismatch raises."""
    from earthmover_spark.sources.readers import read_fixedwidth
    from earthmover_spark.util import EarthmoverSparkError

    p = str(tmp_path / "inf.fwf")
    with open(p, "w") as fh:
        fh.write("alpha   12  x\n")
        fh.write("be      345 yz\n")
    df = read_fixedwidth(spark, p, columns=["w", "n", "t"])
    got = {tuple(r) for r in df.collect()}
    assert got == {("alpha", "12", "x"), ("be", "345", "yz")}
    with pytest.raises(EarthmoverSparkError, match="inferred 3 columns"):
        read_fixedwidth(spark, p, columns=["only", "two"]).collect()
