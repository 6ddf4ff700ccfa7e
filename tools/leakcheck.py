#!/usr/bin/env python3
"""Leak sweep: grep the source tree for anything that is not public
knowledge — internal-looking imports, URLs, buckets, env vars, keys.

Usage: python3 tools/leakcheck.py [round_number]

Writes LEAKCHECK.json (category -> hits, plus the run command and a
timestamp, so each round's sweep is verifiably regenerated rather than
a hand-bumped round number).

Categories (regexes over src/, build.sbt, *.md excluding the
driver-written survey/verdict/advice/snippets/papers artifacts):
everything the repo is allowed to import is org.apache.*, scala.*,
java.*, graft.* — any other import is a hit; URLs must be in a public
allowlist; obvious credential shapes are always hits.
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Files the sweep covers: everything we author. Driver-written
# artifacts (SURVEY/VERDICT/ADVICE/PAPERS/SNIPPETS/BASELINE,
# correctness/bench dumps) are not ours and may cite anything;
# target/ build caches are machine-written and excluded.
SCAN_GLOBS = ["src/**/*.scala", "build.sbt", "project/*.sbt",
              "project/*.scala", "tools/**/*.py", "COVERAGE.md", "README.md"]

PUBLIC_URL_ALLOW = re.compile(
    r"(apache\.org|github\.com|arxiv\.org|aclanthology\.org|duckdb\.org|"
    r"scala-lang\.org|scalatest\.org|w3\.org|unicode\.org|ietf\.org|"
    r"wikipedia\.org|example\.com|localhost)")

CHECKS = {
    # any Scala import outside the public roots: org.apache.*, scala.*,
    # java[x].*, graft.*, the declared test deps (scalatest/scalacheck),
    # and local-value imports (x.implicits._, CompanionObject._)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.|scala\.|java\.|javax\.|graft\.|"
        r"org\.scalatest\b|org\.scalacheck\b|"
        r"[a-z]\w*\.implicits\._|[A-Z]\w*[._])[a-zA-Z_][\w.]*",
        re.M),
    # URLs pointing anywhere non-public
    "internal-url": re.compile(r"https?://[\w.-]+"),
    # package decls outside graft / the one bridge package
    "internal-pkg2": re.compile(
        r"^\s*package\s+(?!graft\b|graft\.|org\.apache\.spark\.sql\.graftbridge)[\w.]+",
        re.M),
    # cloud bucket URIs
    "internal-bucket": re.compile(r"\b(?:s3|gs|s3a|s3n|abfss?)://[\w./-]+"),
    # slack-style short links
    "slack-link": re.compile(r"\bgo/[a-z][\w-]+"),
    # credential shapes
    "api-key": re.compile(
        r"(?:sk-[A-Za-z0-9]{16,}|AKIA[A-Z0-9]{16}|ghp_[A-Za-z0-9]{20,})"),
    # env vars other than the documented SPARK_*/COURSIER_* knobs
    "axon-env": re.compile(
        r"sys\.env(?:\.get(?:OrElse)?)?\(\"(?!SPARK_|COURSIER_)[A-Z_]+\""),
}


def scan():
    hits = {k: [] for k in CHECKS}
    for pattern in SCAN_GLOBS:
        for f in sorted(ROOT.glob(pattern)):
            if not f.is_file():
                continue
            try:
                text = f.read_text(errors="replace")
            except OSError:
                continue
            rel = str(f.relative_to(ROOT))
            for name, rx in CHECKS.items():
                if name == "internal-import" and not rel.endswith(".scala"):
                    continue  # python stdlib imports are not Scala deps
                for m in rx.finditer(text):
                    frag = m.group(0).strip()
                    if name == "internal-url" and PUBLIC_URL_ALLOW.search(frag):
                        continue
                    line = text.count("\n", 0, m.start()) + 1
                    hits[name].append(f"{rel}:{line}: {frag}")
    return hits


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None
    hits = scan()
    try:
        head = subprocess.run(
            ["git", "-C", str(ROOT), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True).stdout.strip()
    except Exception:
        head = "unknown"
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "command": "python3 tools/leakcheck.py" + (f" {rnd}" if rnd else ""),
        "git_head": head,
        "run_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"{out['n_hits']} hits -> LEAKCHECK.json (head {head})")
    for k, v in hits.items():
        for h in v:
            print(f"  [{k}] {h}")


if __name__ == "__main__":
    main()
