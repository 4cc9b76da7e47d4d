#!/usr/bin/env python3
"""Scan the repo's source for anything that looks like a reference to a
non-public system: internal package imports, private URLs/hosts, cloud
bucket paths, chat links, credential-shaped strings, or site-specific
environment variables. Everything the engine builds on must be public
(Apache Spark, the public reference repo, published papers) — a clean
run is evidence only if it records WHAT was scanned, so the output
carries provenance (timestamp, file list size, LoC scanned).

Usage: python3 tools/leakcheck.py [round_number] > LEAKCHECK.json
"""
import json, os, re, subprocess, sys, time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROUND = int(sys.argv[1]) if len(sys.argv) > 1 else 0

# Public hosts that are fine to mention in docs/comments.
PUBLIC_HOSTS = (
    "apache.org", "github.com", "scala-lang.org", "scalatest.org",
    "duckdb.org", "w3.org", "arxiv.org", "acm.org", "wikipedia.org",
    "example.com", "localhost",
)

CATEGORIES = {
    # import/package lines rooted in a company-style namespace — the
    # build resolves nothing beyond Spark + scalatest/scalacheck, so any
    # com./net./io./ai. import means code referencing a private system
    # (local `import s.implicits._` value imports are not flagged)
    "internal-import": re.compile(
        r"^\s*import\s+(?:com|net|io|ai|dev|cloud|corp|internal)\.[\w.]+", re.M),
    "internal-url": re.compile(r"https?://[\w.-]+"),
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|wasbs?|abfss?|hdfs)://[\w./-]+"),
    "slack-link": re.compile(r"slack\.com|app\.slack|#[a-z0-9-]*-(?:eng|team|infra)\b"),
    "api-key": re.compile(
        r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{36}"
        r"|xox[baprs]-[A-Za-z0-9-]{10,})\b"),
    # env vars: anything read from the environment that is not the
    # engine's own SPARK_GRAFT_* surface or standard JAVA/SPARK/PATH
    "internal-env": re.compile(
        r"sys\.env(?:\.get(?:OrElse)?)?\(\"(?!SPARK_GRAFT_|JAVA_|SPARK_|PATH|HOME|USER|TMPDIR)[A-Z0-9_]+\""),
}

def tracked_files():
    out = subprocess.run(["git", "ls-files", "src", "tools", "build.sbt"],
                         cwd=ROOT, capture_output=True, text=True).stdout
    return [f for f in out.splitlines() if f]

hits = {k: [] for k in CATEGORIES}
n_files, n_loc = 0, 0
for rel in tracked_files():
    path = os.path.join(ROOT, rel)
    try:
        text = open(path, encoding="utf-8").read()
    except (UnicodeDecodeError, FileNotFoundError):
        continue
    n_files += 1
    n_loc += text.count("\n")
    for cat, rx in CATEGORIES.items():
        for m in rx.finditer(text):
            frag = m.group(0)
            if cat == "internal-url" and any(h in frag for h in PUBLIC_HOSTS):
                continue
            line = text.count("\n", 0, m.start()) + 1
            hits[cat].append(f"{rel}:{line}: {frag[:80]}")

result = {
    "round": ROUND,
    "n_hits": sum(len(v) for v in hits.values()),
    "hits": hits,
    "provenance": {
        "scanned_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "files_scanned": n_files,
        "loc_scanned": n_loc,
        "scanner": "tools/leakcheck.py",
        "scope": "git-tracked files under src/, tools/, build.sbt",
    },
}
print(json.dumps(result, indent=2))
