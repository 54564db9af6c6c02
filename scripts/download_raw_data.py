#!/usr/bin/env python
"""Download MassiveDS raw datastore domains from the HF hub.

The reference ships a wget loop over ``rulins/raw_data``
(reference: scripts/download_raw_data.sh). This is the same contract —
``raw_data/<domain>/<file>.jsonl`` on disk, resumable, with the file list
discovered from the hub tree — behind a mockable fetch boundary so it can
be exercised offline (tests monkeypatch ``list_repo_files``/``fetch_file``).

    python scripts/download_raw_data.py --domains dpr_wiki math pubmed
    python scripts/download_raw_data.py --list           # show domains
    python scripts/download_raw_data.py --domains all --out raw_data/
"""

import argparse
import os
import sys
import urllib.request

REPO = "rulins/raw_data"
# domain -> hub path prefix (reference: download_raw_data.sh mkdir targets)
DOMAINS = {
    "dpr_wiki": "dpr_wiki/",
    "math": "math/",
    "pes2o": "pes2o/",
    "pubmed": "pubmed/",
    "redpajama_arxiv": "redpajama_v1/arxiv/",
    "redpajama_book": "redpajama_v1/book/",
    "redpajama_c4": "redpajama_v1/c4/",
    "redpajama_github": "redpajama_v1/github/",
    "redpajama_stackexchange": "redpajama_v1/stackexchange/",
    "redpajama_wikipedia": "redpajama_v1/wikipedia/",
}


def list_repo_files(repo: str = REPO):
    """Hub tree listing; prefers huggingface_hub, falls back to the API."""
    try:
        from huggingface_hub import list_repo_files as hub_list

        return hub_list(repo, repo_type="dataset")
    except Exception:
        import json

        url = f"https://huggingface.co/api/datasets/{repo}/tree/main?recursive=true"
        with urllib.request.urlopen(url, timeout=60) as resp:
            tree = json.loads(resp.read())
        return [e["path"] for e in tree if e.get("type") == "file"]


def fetch_file(repo: str, path: str, out_path: str) -> None:
    """One file, atomically written (partial downloads never surface)."""
    url = f"https://huggingface.co/datasets/{repo}/resolve/main/{path}?download=true"
    tmp = out_path + ".part"
    with urllib.request.urlopen(url, timeout=600) as resp, open(tmp, "wb") as f:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
    os.replace(tmp, out_path)


def download_domains(domains, out_dir: str, repo: str = REPO,
                     list_fn=list_repo_files, fetch_fn=fetch_file) -> list:
    """Fetch every file under each domain prefix; skip existing (resume).

    Returns the list of files written. ``list_fn``/``fetch_fn`` are
    injectable for offline tests.
    """
    files = list_fn(repo)
    written = []
    for domain in domains:
        prefix = DOMAINS[domain]
        members = [f for f in files if f.startswith(prefix)]
        if not members:
            print(f"warning: no files under {prefix!r} in {repo}", file=sys.stderr)
        for path in members:
            out_path = os.path.join(out_dir, path)
            if os.path.exists(out_path):
                continue
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            print(f"fetching {path} -> {out_path}", file=sys.stderr)
            fetch_fn(repo, path, out_path)
            written.append(out_path)
    return written


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--domains", nargs="+", default=None,
                    help="domain names, or 'all'")
    ap.add_argument("--out", default="raw_data")
    ap.add_argument("--repo", default=REPO)
    ap.add_argument("--list", action="store_true", help="print known domains")
    args = ap.parse_args(argv)
    if args.list or not args.domains:
        print("\n".join(DOMAINS))
        return
    domains = list(DOMAINS) if args.domains == ["all"] else args.domains
    unknown = [d for d in domains if d not in DOMAINS]
    if unknown:
        raise SystemExit(f"unknown domains {unknown}; known: {list(DOMAINS)}")
    written = download_domains(domains, args.out, repo=args.repo)
    print(f"downloaded {len(written)} files to {args.out}")


if __name__ == "__main__":
    main()
