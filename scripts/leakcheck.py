#!/usr/bin/env python3
"""Leak checker: scan the repo's own sources/docs for references that
should never appear in a from-public-knowledge build — non-public
imports, URLs, buckets, chat links, credentials, unexpected env vars.

Usage: python3 scripts/leakcheck.py <round> [repo_root]
Writes LEAKCHECK.json (same shape every round) and prints it.

Each hit is "path:line: excerpt". Allowlists are the public surfaces
this project is built on (Apache Spark/Scala/Java stdlib, its own
graft.* packages, github/apache/duckdb doc links, the SPARK_GRAFT_*
bench contract).
"""
import json
import os
import re
import sys

SCAN_DIRS = ["src", "scripts"]
SCAN_FILES = ["build.sbt", "Bench.scala", "Verify.scala",
              "SURVEY.md", "SCALING.md", "TESTDATA.md"]
EXTS = {".scala", ".sbt", ".py", ".md", ".sql", ".conf", ".json"}

PUBLIC_IMPORT = re.compile(
    r"^\s*import\s+(?:org\.apache\.|org\.scalatest|org\.scalacheck|"
    r"scala\.|java\.|javax\.|graft\.)")
# only domain-rooted package imports can leak a non-public system;
# local-value imports (spark.implicits._, SomeObject.member) cannot
IMPORT = re.compile(
    r"^\s*import\s+(?:com|net|io|ai|co|dev|org|edu|gov|us|uk|de|cn)\.")
URL = re.compile(r"https?://[\w.-]+")
PUBLIC_URL_HOSTS = re.compile(
    r"^(?:[\w-]+\.)*(?:apache\.org|github\.com|githubusercontent\.com|"
    r"scala-lang\.org|duckdb\.org|scalatest\.org|tpc\.org|arxiv\.org|"
    r"localhost|example\.com)$")
BUCKET = re.compile(r"\b(?:s3a?|gs|wasbs?|abfss?)://[\w./-]+")
SLACK = re.compile(r"slack\.com/|app\.slack|#[a-z0-9-]*slack", re.I)
APIKEY = re.compile(
    r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{30,}|"
    r"xox[bap]-[A-Za-z0-9-]{10,}|AIza[0-9A-Za-z_-]{30,})\b")
ENVVAR = re.compile(r'sys\.env(?:\.getOrElse)?\(\s*"([A-Z0-9_]+)"'
                    r'|os\.environ(?:\.get)?\[?\(?["\']([A-Z0-9_]+)')
PUBLIC_ENV = re.compile(r"^(?:SPARK_|JAVA_|SBT_|COURSIER_|PATH$|HOME$|"
                        r"TMPDIR$|USER$|LANG$|TZ$)")
# hosts/packages that would indicate copying from a non-public system:
# anything that is neither an allowlisted public host nor this repo
PKG2 = re.compile(r"^\s*import\s+(?:com|net|io)\.(?!github\b)[\w.]+")


def files(root):
    for d in SCAN_DIRS:
        for dirpath, _, names in os.walk(os.path.join(root, d)):
            for n in names:
                if os.path.splitext(n)[1] in EXTS:
                    yield os.path.join(dirpath, n)
    for f in SCAN_FILES:
        p = os.path.join(root, f)
        if os.path.isfile(p):
            yield p


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    root = sys.argv[2] if len(sys.argv) > 2 else "."
    hits = {k: [] for k in ["internal-import", "internal-url",
                            "internal-pkg2", "internal-bucket",
                            "slack-link", "api-key", "axon-env"]}
    me = os.path.relpath(__file__, root)
    for path in files(root):
        rel = os.path.relpath(path, root)
        if rel == me or rel.endswith("LEAKCHECK.json"):
            continue
        try:
            lines = open(path, errors="replace").read().splitlines()
        except OSError:
            continue
        for i, line in enumerate(lines, 1):
            where = f"{rel}:{i}: {line.strip()[:120]}"
            if rel.endswith((".scala", ".sbt")) and IMPORT.match(line):
                if not PUBLIC_IMPORT.match(line):
                    hits["internal-import"].append(where)
                if PKG2.match(line):
                    hits["internal-pkg2"].append(where)
            for m in URL.finditer(line):
                host = m.group(0).split("://", 1)[1].split("/", 1)[0]
                if not PUBLIC_URL_HOSTS.match(host):
                    hits["internal-url"].append(where)
            if BUCKET.search(line):
                hits["internal-bucket"].append(where)
            if SLACK.search(line):
                hits["slack-link"].append(where)
            if APIKEY.search(line):
                hits["api-key"].append(where)
            for m in ENVVAR.finditer(line):
                var = m.group(1) or m.group(2)
                if var and not PUBLIC_ENV.match(var):
                    hits["axon-env"].append(where)
    out = {"round": rnd, "n_hits": sum(map(len, hits.values())),
           "hits": hits}
    with open(os.path.join(root, "LEAKCHECK.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
