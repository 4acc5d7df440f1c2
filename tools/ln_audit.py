#!/usr/bin/env python3
"""Audit cross-engine bit-identity of every ln() argument the log-scored
queries (tfidf_topterms, bm25_search, doc_logprob, doc_logprob_bigram,
dsir_weights)
actually evaluate at a scale factor: Java's Math.log and DuckDB's ln are NOT bit-identical over
all of (0,1) (sampled ~0.2% of arguments differ in the last ulp), so any
NEW log-based scoring must audit its real argument set like this before
trusting hash equality.

Usage: python3 tools/ln_audit.py [sfdir ...]   (default: sf0.01 sf0.1)
Exit 0 iff every actual argument is bit-identical.

Caveat shared with every tokenizing oracle here: Java \s includes
vertical tab (U+000B), RE2's does not — corpora containing \x0B would
tokenize differently across engines before ln is ever reached.
"""
import struct, subprocess, sys, tempfile
from pathlib import Path

import duckdb

SFS = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
TOK = """WITH t AS (SELECT doc_id, u.token FROM documents,
         UNNEST(string_split(regexp_replace(lower(trim(text)),'\\s+',' ','g'),' ')) u(token)),
         td AS (SELECT token, doc_id, count(*) tf FROM t GROUP BY 1,2)"""

con = duckdb.connect()
args = set()
for sfd in SFS:
    con.execute(f"CREATE OR REPLACE VIEW documents AS SELECT * FROM '{sfd}/documents.parquet'")
    # doc_logprob: ln(ctf / T)
    for a, b in con.execute(TOK + """, v AS (SELECT token, sum(tf) ctf FROM td GROUP BY 1),
        tt AS (SELECT sum(ctf) T FROM v)
        SELECT DISTINCT CAST(ctf AS BIGINT), CAST(T AS BIGINT) FROM v, tt""").fetchall():
        args.add(("div", a, b))
    # tfidf: ln(N / df)
    for a, b in con.execute(TOK + """, df AS (SELECT token, count(*) df FROM td GROUP BY 1),
        n AS (SELECT count(*) nd FROM documents)
        SELECT DISTINCT CAST(nd AS BIGINT), CAST(df AS BIGINT) FROM df, n""").fetchall():
        args.add(("div", a, b))
    # bm25: ln((N - df + 0.5) / (df + 0.5))
    for a, b in con.execute(TOK + """, q AS (SELECT * FROM td WHERE token IN ('spark','join','window')),
        df AS (SELECT token, count(*) df FROM q GROUP BY 1),
        n AS (SELECT count(*) nd FROM documents)
        SELECT DISTINCT CAST(nd AS BIGINT), CAST(df AS BIGINT) FROM df, n""").fetchall():
        args.add(("bm", a, b))
    # doc_logprob_bigram: ln((c2 + 0.5) / (c1 + 0.5 * V))
    for a, b, v in con.execute("""WITH d AS (SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)),'\\s+',' ','g'),' ') AS t FROM documents),
        bg AS (SELECT t[p.i] AS prev, t[p.i+1] AS cur FROM d, UNNEST(range(1, len(t))) p(i)),
        c2 AS (SELECT prev, cur, count(*) c2 FROM bg GROUP BY 1,2),
        u AS (SELECT u.w AS w FROM d, UNNEST(t) u(w)),
        c1 AS (SELECT w, count(*) c1 FROM u GROUP BY 1),
        vs AS (SELECT count(*) v FROM c1)
        SELECT DISTINCT CAST(c2.c2 AS BIGINT), CAST(c1.c1 AS BIGINT), CAST(v AS BIGINT)
        FROM c2 JOIN c1 ON c2.prev = c1.w CROSS JOIN vs""").fetchall():
        args.add(("bg2", a, b, v))
    # dsir_weights: ln((ctf + 0.5) / (T + 0.5 * V)) under both the
    # target-English and full-corpus unigram LMs (same functional form
    # as the bg2 family, so it reuses that audit kind)
    for a, b, v in con.execute(TOK + """, dl AS (SELECT doc_id, lang FROM documents),
        lm AS (SELECT token, sum(tf) ca, sum(CASE WHEN lang='en' THEN tf ELSE 0 END) ct
               FROM td JOIN dl USING (doc_id) GROUP BY 1),
        tt AS (SELECT sum(ca) ta, sum(ct) tt, count(*) vv FROM lm)
        SELECT DISTINCT CAST(ca AS BIGINT), CAST(ta AS BIGINT), CAST(vv AS BIGINT) FROM lm, tt
        UNION
        SELECT DISTINCT CAST(ct AS BIGINT), CAST(tt AS BIGINT), CAST(vv AS BIGINT) FROM lm, tt""").fetchall():
        args.add(("bg2", a, b, v))

    # hourly_entropy: ln(c / N) over hour-of-day counts per event type
    con.execute(f"CREATE OR REPLACE VIEW events AS SELECT * FROM '{sfd}/events.parquet'")
    for a, b in con.execute("""WITH c AS (SELECT event_type, hour(ts) h, count(*) c
          FROM events GROUP BY 1, 2),
        g AS (SELECT event_type, CAST(sum(c) AS BIGINT) n FROM c GROUP BY 1)
        SELECT DISTINCT CAST(c.c AS BIGINT), g.n
        FROM c JOIN g ON c.event_type = g.event_type""").fetchall():
        args.add(("div", a, b))

    # mutual_info: ln((cth*N) / (ct*ch)) over the type x hour table
    for a, b in con.execute("""WITH cont AS (SELECT event_type, hour(ts) h, count(*) c
          FROM events GROUP BY 1, 2),
        ct AS (SELECT event_type, sum(c) ct FROM cont GROUP BY 1),
        ch AS (SELECT h, sum(c) ch FROM cont GROUP BY 1),
        n AS (SELECT sum(c) n FROM cont)
        SELECT DISTINCT CAST(cont.c * n.n AS BIGINT), CAST(ct.ct * ch.ch AS BIGINT)
        FROM cont JOIN ct USING (event_type) JOIN ch USING (h) CROSS JOIN n""").fetchall():
        args.add(("div", a, b))

    # zipf_fit: ln(rank) for ranks 1..1000 and ln(f) for the top-1000
    # token frequencies
    for (a,) in con.execute(TOK + """, v AS (SELECT token, sum(tf) f FROM td GROUP BY 1),
        top AS (SELECT f FROM v ORDER BY f DESC, token LIMIT 1000)
        SELECT DISTINCT CAST(f AS BIGINT) FROM top""").fetchall():
        args.add(("div", a, 1))
    for r in range(1, 1001):
        args.add(("div", r, 1))

work = Path(tempfile.mkdtemp(prefix="ln_audit"))
out = work / "java_ln.txt"
# Tuples go to a data file read by a fixed-size Java loop — one println
# per argument in main() hits javac's 64KB method-bytecode limit beyond a
# few thousand distinct arguments (larger SFs / vocabularies).
inp = work / "ln_args.csv"
inp.write_text("".join(",".join(map(str, t)) + "\n" for t in sorted(args)))
src = f"""public class LnAudit {{ public static void main(String[] x) throws Exception {{
  java.io.BufferedReader r = new java.io.BufferedReader(new java.io.FileReader("{inp}"));
  java.io.PrintWriter w = new java.io.PrintWriter("{out}");
  String line;
  while ((line = r.readLine()) != null) {{
    String[] f = line.split(",");
    long a = Long.parseLong(f[1]), b = Long.parseLong(f[2]);
    double v;
    if (f[0].equals("div")) v = Math.log((double) a / b);
    else if (f[0].equals("bg2")) {{
      long vs = Long.parseLong(f[3]);
      v = Math.log(((double) a + 0.5) / ((double) b + 0.5 * vs));
    }} else v = Math.log(((double) a - b + 0.5) / (b + 0.5));
    w.println(line + "," + Double.doubleToLongBits(v));
  }}
  r.close(); w.close(); }} }}"""
(work / "LnAudit.java").write_text(src)
subprocess.run(["javac", "LnAudit.java"], cwd=work, check=True)
subprocess.run(["java", "LnAudit"], cwd=work, check=True)

bad = n = 0
for line in out.read_text().splitlines():
    parts = line.split(",")
    kind, bits = parts[0], int(parts[-1])
    a, b = int(parts[1]), int(parts[2])
    if kind == "div":
        sql = f"SELECT ln(CAST({a} AS DOUBLE) / {b})"
    elif kind == "bg2":
        vv = int(parts[3])
        sql = f"SELECT ln((CAST({a} AS DOUBLE) + 0.5) / (CAST({b} AS DOUBLE) + 0.5 * {vv}))"
    else:
        sql = f"SELECT ln((CAST({a} AS DOUBLE) - {b} + 0.5) / ({b} + 0.5))"
    v = con.execute(sql).fetchone()[0]
    db = struct.unpack("<q", struct.pack("<d", v))[0]
    n += 1
    if db != bits:
        bad += 1
        print(f"MISMATCH {kind} a={a} b={b}")
print(f"{n} actual ln arguments compared, {bad} bit-mismatches")
sys.exit(1 if bad else 0)
