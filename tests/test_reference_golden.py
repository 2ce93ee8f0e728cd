"""Golden-file byte-compare against the COMPILED reference engine.

Compiles ``/root/reference`` (copied to a temp dir — the reference
tree is read-only), generates its test database with ``RandomDB`` +
``ConvertTxtToTbl``, runs ``QueryMain`` on every shipped test query
(query1-7, 9, 10 — there is no query8), then runs the SAME dialect
text over the SAME generated data through :class:`KajEngineGolden`
and byte-diffs the two result files.

What "byte-diff" means here, and why:

- The reference's ``RandomOptimizer`` randomizes join order per run
  (``src/qp/optimizer/RandomOptimizer.java``), which makes BOTH the
  column order of ``SELECT *`` join results (schema = concat in join
  order) and the row order of its output nondeterministic across its
  own runs. So the comparison is exact bytes modulo exactly those two
  documented freedoms: columns are aligned by their unique qualified
  header tokens, rows compared as a sorted multiset of rendered lines.
- For queries whose header order IS deterministic (explicit project
  lists, single-table ``SELECT *``) the header line must match
  byte-for-byte, including the reference's two-space token separators
  (``src/QueryMain.java:276-290``) and per-cell trailing tabs
  (``printTuple``, ``src/QueryMain.java:292-306``).

Env-skipped when no JDK is present.
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

REF = "/root/reference"
TABLES = ("CUSTOMER", "CART", "CARTDETAILS", "BILL", "PRICES")
QUERIES = (1, 2, 3, 4, 5, 6, 7, 9, 10)
# explicit project list or single-table FROM → deterministic header
DETERMINISTIC_HEADER = {1, 2, 3, 7, 9, "R1", "R2", "R3", "R4", "R5"}
# single-table total-order ORDERBY → row order is deterministic too
ORDERED_ROWS = {"R4", "R5"}

pytestmark = pytest.mark.skipif(
    shutil.which("javac") is None or shutil.which("java") is None,
    reason="JDK not available to compile the reference engine",
)


def _run(args, cwd, timeout=300):
    proc = subprocess.run(
        args, cwd=cwd, capture_output=True, text=True, timeout=timeout
    )
    assert proc.returncode == 0, (
        f"{' '.join(args)} failed:\n{proc.stdout}\n{proc.stderr}"
    )
    return proc


@pytest.fixture(scope="session")
def ref_work(tmp_path_factory):
    """Compile the reference, generate its DB, run all test queries;
    returns the work dir holding ``queryN.sql``, ``<T>.det/.txt`` and
    the reference's ``refN.out`` result files."""
    ws = tmp_path_factory.mktemp("refgolden")
    for d in ("src", "lib", "testcases"):
        shutil.copytree(f"{REF}/{d}", ws / d)
    (ws / "classes").mkdir()
    _run(
        [
            "javac", "-d", "classes", "-classpath", "lib",
            "-sourcepath", "src", "src/QueryMain.java",
            "src/ConvertTxtToTbl.java", "src/RandomDB.java",
        ],
        cwd=ws,
    )
    work = ws / "work"
    work.mkdir()
    for f in (ws / "testcases").iterdir():
        shutil.copy(f, work / f.name)
    # REAL-column coverage: the shipped testcases are INTEGER/STRING
    # only, so float rendering (Java Float.toString) would go
    # unexercised — add a table with a REAL column and two queries
    (work / "PRICES.det").write_text(
        "3\n28\n"
        "pid INTEGER 200 PK 4\n"
        "price REAL 2500 NK 4\n"
        "label STRING 10 NK 20\n"
    )
    (work / "queryR1.sql").write_text("SELECT *\nFROM PRICES")
    (work / "queryR2.sql").write_text(
        "SELECT PRICES.pid,PRICES.price\nFROM PRICES\n"
        'WHERE PRICES.price>"1200"'
    )
    # witness-quirk coverage (SURVEY §2.3.1): with BOTH aggregates
    # present the reference emits the row(s) whose value in the FIRST
    # MIN column equals the global minimum — MIN beats MAX
    (work / "queryR3.sql").write_text(
        "SELECT CUSTOMER.cid, MIN(CART.cartid), MAX(CART.cartid), "
        "CART.status\nFROM CUSTOMER,CART\nWHERE CUSTOMER.cid=CART.cid"
    )
    # ORDERBY coverage with a total order (float prices are a.s.
    # distinct) — these two are compared IN ORDER, byte-for-byte,
    # pinning the whole-list ASC default and the DESC flag
    (work / "queryR4.sql").write_text(
        "SELECT *\nFROM PRICES\nORDERBY PRICES.price"
    )
    (work / "queryR5.sql").write_text(
        "SELECT PRICES.pid,PRICES.price\nFROM PRICES\n"
        "ORDERBY PRICES.price DESC"
    )
    cp = f"{ws}/classes:{ws}/lib"
    for t in TABLES:
        _run(["java", "-cp", cp, "RandomDB", t, "100"], cwd=work)
        _run(["java", "-cp", cp, "ConvertTxtToTbl", t], cwd=work)
    for q in (*QUERIES, "R1", "R2", "R3", "R4", "R5"):
        # args: queryfile resultfile pagesize numbuffer <5th arg skips
        # the interactive continue prompt, QueryMain.java:166-180>
        _run(
            [
                "java", "-cp", cp, "QueryMain", f"query{q}.sql",
                f"ref{q}.out", "8192", "1000", "auto",
            ],
            cwd=work,
        )
    return work


@pytest.fixture(scope="session")
def golden_engine(spark, ref_work):
    """KajEngineGolden over the REFERENCE-generated data: each
    ``<T>.txt`` (tab-separated, trailing tab per row) read with the
    ``.det`` schema — INTEGER→int, STRING→string, exactly the typing
    ``ConvertTxtToTbl`` applies."""
    from kaj_query_engine_spark.engine import KajEngineGolden
    from kaj_query_engine_spark.sources.datagen import load_det

    typ = {"INTEGER": "int", "STRING": "string", "REAL": "float"}
    eng = KajEngineGolden(spark)
    for t in TABLES:
        det = load_det(str(ref_work / f"{t}.det"))
        ddl = ", ".join(f"{c.name} {typ[c.dtype]}" for c in det.columns)
        df = (
            spark.read.schema(ddl + ", _trail string")
            .csv(str(ref_work / f"{t}.txt"), sep="\t")
            .drop("_trail")  # every data row ends with a tab
        )
        eng.register(t.lower(), df)
    return eng


def _split(raw: bytes) -> tuple[str, list[str]]:
    header, _, body = raw.decode().partition("\n")
    lines = [ln for ln in body.split("\n") if ln != ""]
    return header, lines


def _tokens(header: str) -> list[str]:
    return [t for t in header.split("  ") if t]


def _real_tokens(ref_work) -> set[str]:
    """Qualified header tokens of REAL-typed columns, from the .det
    specs — the cells whose byte rendering is JDK-version-dependent in
    the scientific range (see ``sources/javafmt.py``)."""
    from kaj_query_engine_spark.sources.datagen import load_det

    out = set()
    for t in TABLES:
        det = load_det(str(ref_work / f"{t}.det"))
        out.update(f"{t}.{c.name}" for c in det.columns if c.dtype == "REAL")
    return out


@pytest.mark.parametrize("qnum", (*QUERIES, "R1", "R2", "R3", "R4", "R5"))
def test_reference_golden_byte_parity(golden_engine, ref_work, qnum):
    import numpy as np

    from kaj_query_engine_spark.sources.javafmt import java_float_str

    qtext = (ref_work / f"query{qnum}.sql").read_text()
    out_path = ref_work / f"mine{qnum}.out"
    golden_engine.execute_to_golden(qtext, str(out_path))

    ref_header, ref_lines = _split((ref_work / f"ref{qnum}.out").read_bytes())
    my_header, my_lines = _split(out_path.read_bytes())
    ref_toks, my_toks = _tokens(ref_header), _tokens(my_header)

    if qnum in DETERMINISTIC_HEADER:
        assert my_header == ref_header  # byte-exact, two-space dialect
    else:
        # join order (and with it SELECT * column order) is the
        # reference optimizer's per-run random choice — align columns
        # by qualified name, which must be the same unique set
        assert sorted(my_toks) == sorted(ref_toks)

    perm = [ref_toks.index(t) for t in my_toks]
    # REAL cells: canonicalize BOTH files through the shortest-digit
    # renderer. In the decimal range [1e-3, 1e7) — where RandomDB
    # values land except a ~4e-7/row tail — this is the identity on
    # every JDK (fuzz-pinned below); in the tail, JDK <= 18 prints
    # extra non-shortest digits for the SAME float32 value, which
    # must not read as a value mismatch. Parsing is correctly rounded
    # on both sides, so canonicalization never masks a real
    # difference in value.
    real_idx = {i for i, t in enumerate(my_toks) if t in _real_tokens(ref_work)}

    def canon(cells: list[str]) -> str:
        return "".join(
            (java_float_str(np.float32(c)) if i in real_idx and c != "-NULL-" else c)
            + "\t"
            for i, c in enumerate(cells)
        )

    def realign(line: str) -> str:
        cells = line.split("\t")[:-1]  # trailing tab → drop empty tail
        return canon([cells[p] for p in perm])

    mine = [canon(ln.split("\t")[:-1]) for ln in my_lines]
    theirs = [realign(ln) for ln in ref_lines]
    if qnum in ORDERED_ROWS:
        # ORDERBY over a total order: the reference's emitted ROW
        # ORDER is deterministic — compare in sequence, not as a set
        assert theirs == mine, (
            f"query{qnum}: ordered rows differ from the reference engine"
        )
    else:
        assert sorted(theirs) == sorted(mine), (
            f"query{qnum}: result multiset differs from the reference engine"
        )


_FUZZ_JAVA = """
public class PrintFloats {
    public static void main(String[] args) {
        java.util.Random r = new java.util.Random(42);
        for (int i = 0; i < 8000; i++) {
            int bits = r.nextInt();
            float f = Float.intBitsToFloat(bits);
            if (Float.isNaN(f)) continue;
            System.out.println("F\\t" + bits + "\\t" + Float.toString(f));
        }
        for (int i = 0; i < 8000; i++) {
            float f = 2500f * r.nextFloat();
            System.out.println(
                "F\\t" + Float.floatToIntBits(f) + "\\t" + Float.toString(f));
        }
        for (int i = 0; i < 8000; i++) {
            long bits = r.nextLong();
            double d = Double.longBitsToDouble(bits);
            if (Double.isNaN(d)) continue;
            System.out.println("D\\t" + bits + "\\t" + Double.toString(d));
        }
        for (int i = 0; i < 8000; i++) {
            double d = 2500d * r.nextDouble();
            System.out.println(
                "D\\t" + Double.doubleToLongBits(d) + "\\t" + Double.toString(d));
        }
    }
}
"""


def test_java_float_renderers_fuzz_parity(tmp_path):
    """Fuzz the pure-Python Java-float renderers against the real JVM:
    byte-identical for every value in the decimal range
    [1e-3, 1e7) — the range all RandomDB REAL data lives in — on any
    JDK, and round-trip-equal in the scientific range (JDK <= 18's
    legacy FloatingDecimal emits extra non-shortest digits there;
    JDK 19+ matches byte-for-byte)."""
    import numpy as np

    from kaj_query_engine_spark.sources.javafmt import (
        java_double_str,
        java_float_str,
    )

    (tmp_path / "PrintFloats.java").write_text(_FUZZ_JAVA)
    _run(["javac", "PrintFloats.java"], cwd=tmp_path)
    proc = _run(["java", "PrintFloats"], cwd=tmp_path)
    n_inrange = 0
    for line in proc.stdout.splitlines():
        kind, bits_s, jstr = line.split("\t")
        ftype = np.float32 if kind == "F" else np.float64
        if kind == "F":
            v = np.int32(int(bits_s)).view(np.float32)
            mine = java_float_str(v)
        else:
            v = np.int64(int(bits_s)).view(np.float64)
            mine = java_double_str(v)
        a = abs(float(v))
        if v == 0 or 1e-3 <= a < 1e7:
            n_inrange += 1
            assert mine == jstr, f"{kind} bits={bits_s}: java={jstr} mine={mine}"
        else:
            # scientific range: both strings must round-trip to the
            # same value at the type's own precision; exact bytes
            # depend on the JDK (<=18 prints extra non-shortest digits)
            mv = ftype(mine.replace("Infinity", "inf"))
            jv = ftype(jstr.replace("Infinity", "inf"))
            assert mv == jv, f"{kind} bits={bits_s}: java={jstr} mine={mine}"
    assert n_inrange > 5000  # the byte-exact claim actually got exercised
