"""Locale maintenance tool: scan sources for i18n("...") keys and reconcile
the locale JSON files (spec: the reference's tools/i18n/scan_i18n.py —
AST-scan for I18nAuto call sites, report missing/unused keys, optionally
write updated locale files).

Usage:
  python tools/scan_i18n.py [--write] [--locale zh_CN ...]
"""
from __future__ import annotations

import argparse
import ast
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "index_tts_dubbing_tpu"
LOCALE_DIR = PKG / "utils" / "locale"
I18N_NAMES = {"i18n", "_"}


def scan_keys(paths) -> set:
    keys = set()
    for path in paths:
        try:
            tree = ast.parse(path.read_text(encoding="utf-8"))
        except SyntaxError as e:
            print(f"!! skip {path}: {e}", file=sys.stderr)
            continue
        for node in ast.walk(tree):
            if (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Name)
                    and node.func.id in I18N_NAMES
                    and node.args
                    and isinstance(node.args[0], ast.Constant)
                    and isinstance(node.args[0].value, str)):
                keys.add(node.args[0].value)
    return keys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="update locale files (add missing keys as "
                         "untranslated, drop unused)")
    ap.add_argument("--locale", nargs="*", default=None)
    args = ap.parse_args(argv)

    sources = sorted(PKG.rglob("*.py"))
    keys = scan_keys(sources)
    print(f">> {len(keys)} i18n keys in {len(sources)} source files")

    locales = (args.locale if args.locale
               else [p.stem for p in LOCALE_DIR.glob("*.json")])
    status = 0
    for loc in locales:
        path = LOCALE_DIR / f"{loc}.json"
        cur = (json.loads(path.read_text(encoding="utf-8"))
               if path.exists() else {})
        missing = sorted(keys - set(cur))
        unused = sorted(set(cur) - keys)
        print(f">> {loc}: {len(cur)} entries, {len(missing)} missing, "
              f"{len(unused)} unused")
        for k in missing:
            print(f"   + {k}")
        for k in unused:
            print(f"   - {k}")
        if missing or unused:
            status = 1
        if args.write:
            new = {k: cur.get(k, k) for k in sorted(keys)}
            path.write_text(json.dumps(new, ensure_ascii=False, indent=2,
                                       sort_keys=True) + "\n",
                            encoding="utf-8")
            print(f"   wrote {path}")
            status = 0
    return status


if __name__ == "__main__":
    raise SystemExit(main())
