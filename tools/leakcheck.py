#!/usr/bin/env python3
"""Leak scan: verify the repo references only public systems.

Scans every tracked source/doc file for imports, URLs, package
coordinates, bucket paths, chat links, credential-shaped strings, and
private-infra environment variables that would indicate a non-public
dependency. Emits LEAKCHECK.json with a scan timestamp, the git HEAD,
and a sha256 over the scanned bytes so any re-run is verifiable
against the artifact (same inputs -> same hash).

Usage: python3 tools/leakcheck.py [round_number]
"""
import hashlib
import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PATTERNS = {
    # imports that name obviously non-public namespaces
    "internal-import": re.compile(
        r"^\s*import\s+\S*(internal|proprietary|corp)\.", re.M),
    # URLs outside well-known public hosts
    "internal-url": re.compile(
        r"https?://(?!localhost|127\.0\.0\.1|0\.0\.0\.0|github\.com|"
        r"raw\.githubusercontent\.com|arxiv\.org|doi\.org|www\.w3\.org|"
        r"maven\.apache\.org|repo1\.maven\.org|spark\.apache\.org|"
        r"duckdb\.org|datatracker\.ietf\.org|www\.ietf\.org|"
        r"matroska\.org|www\.matroska\.org|developers\.google\.com|"
        r"api\.node\.glif\.io|docs\.filecoin\.io|filfox\.info|"
        r"cid\.contact|example\.com|en\.wikipedia\.org)[\w.-]+"),
    # dependency coordinates with suspicious group ids
    "internal-pkg2": re.compile(
        r"\"(com|io|ai)\.(?!github)[\w]*(internal|private|corp)[\w]*\""),
    # object-store buckets (none should exist: zero-egress build)
    "internal-bucket": re.compile(r"(s3a?|gs|abfss?)://[\w][\w.-]+"),
    # chat/workspace links
    "slack-link": re.compile(r"(\w+\.slack\.com|slack://|app\.slack)"),
    # credential-shaped strings
    "api-key": re.compile(
        r"(AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{24,}|ghp_[A-Za-z0-9]{36}|"
        r"xox[baprs]-[A-Za-z0-9-]{10,}|-----BEGIN (RSA |EC )?PRIVATE KEY)"),
    # private-infra environment variables
    "axon-env": re.compile(r"\b(AXON|ANTHROPIC|CLAUDE)_[A-Z0-9_]+\b"),
}

SCAN_SUFFIXES = {".scala", ".sbt", ".py", ".md", ".json", ".sql", ".sh",
                 ".yml", ".yaml", ".properties", ".conf"}
SKIP_NAMES = {"LEAKCHECK.json", "leakcheck.py"}  # the artifact and the
# scanner itself (its pattern definitions self-match)


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=ROOT, check=True,
                         capture_output=True, text=True).stdout
    for line in sorted(out.splitlines()):
        p = ROOT / line
        if p.suffix in SCAN_SUFFIXES and p.name not in SKIP_NAMES and p.is_file():
            yield line, p


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {k: [] for k in PATTERNS}
    digest = hashlib.sha256()
    n_files = 0
    for rel, p in tracked_files():
        data = p.read_bytes()
        digest.update(rel.encode())
        digest.update(data)
        n_files += 1
        text = data.decode("utf-8", errors="replace")
        for name, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line_no = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{rel}:{line_no}:{m.group(0)[:80]}")
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT, check=True,
                          capture_output=True, text=True).stdout.strip()
    artifact = {
        "round": rnd,
        "scanned_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_head": head,
        "n_files": n_files,
        "input_sha256": digest.hexdigest(),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps({k: len(v) for k, v in hits.items()}))
    print(f"n_files={n_files} n_hits={artifact['n_hits']}")


if __name__ == "__main__":
    main()
