"""Differential fuzzing of the distributed grep against REAL GNU grep.

The reference shells out the client's raw arguments to grep
(/root/reference/src/LogQuerier/server.py:30-33), so ANY flag
combination is in-scope there — golden tests for single flags can't
cover the interaction space (-v -o, -m with -A, -x -i, multi -e ...).
This test runs seeded random corpora × random flag subsets through both
engines and compares outputs exactly.

Dialect note: patterns are drawn from a portable ERE subset (literal
words, alternation, character classes, +, anchors) valid and identical
in GNU ERE (`grep -E`) and Java regex (`rlike`); GNU-only or Java-only
syntax (back-references, lazy quantifiers, \\< \\>, POSIX classes) is
deliberately out of the pool — dialect parity beyond this subset is
documented as out of scope, matching what the reference's own test
suite exercises.
"""

from __future__ import annotations

import os
import random
import re
import subprocess
from collections import Counter

from stream_processing_spark.sources.grep import dgrep, dgrep_count, dgrep_files

N_CASES = int(os.environ.get("GREP_FUZZ_CASES", "200"))

_WORDS = [
    "error", "Error", "ERROR", "warn", "warning", "info", "disk", "disc",
    "net", "GET", "PUT", "503", "200", "foo.bar", "a+b", "x=y", "retry",
    # regex metacharacters as DATA: these must behave as literals under
    # -F (re.escape on the engine side vs grep's fixed-string matcher)
    # and as syntax when a regex pattern happens to match them
    "[x]", "(y)", "a*b", "q?", "end$", "^start", "pipe|pipe", "back\\slash",
]
_PATTERNS = [
    "error", "ERROR", "dis[kc]", "GET|PUT", "50[0-9]", r"foo\.bar",
    "a+b", "net", "^GET", "error$", "(error|warn) disk", "warn(ing)?",
    "retry", "[A-Z]+", "e..or",
]

_LINE_RE = re.compile(r"^(\d+)[:-](.*)$", re.S)


def _gnu(args: list[str], path: str) -> list[tuple[int, str]]:
    """Run GNU grep on one file; parse `-n`-prefixed output lines into
    (line_no, text), skipping `--` group separators."""
    r = subprocess.run(
        ["grep"] + args + ["--", path],
        capture_output=True, text=True, env={**os.environ, "LC_ALL": "C"},
    )
    assert r.returncode in (0, 1), r.stderr
    out = []
    for ln in r.stdout.splitlines():
        if ln == "--":
            continue
        # GNU grep 3.8 artifact (caught by the r11 fresh-seed rotation):
        # under `-o -x -w` together it prints each match followed by a
        # spurious EMPTY line with no `-n` prefix (repro:
        # `printf 'warn\n' | grep -o -x -w -E 'warn(ing)?'` → two output
        # lines). With -x, -w is semantically redundant (a whole-line
        # match always sits on word boundaries), so the artifact line is
        # dropped rather than emulated; every pattern in the pool needs
        # ≥1 char, so a real -o match is never empty.
        if ln == "" and "-o" in args:
            continue
        m = _LINE_RE.match(ln)
        assert m, ln
        out.append((int(m.group(1)), m.group(2)))
    return out


def _corpus(tmp_path, rng):
    d = tmp_path / "fuzzlogs"
    d.mkdir()
    files = {}
    for fi in range(3):
        lines = []
        for _ in range(rng.randint(40, 80)):
            lines.append(
                " ".join(rng.choice(_WORDS) for _ in range(rng.randint(0, 6)))
            )
        name = f"machine.{fi}.log"
        (d / name).write_text("\n".join(lines) + "\n")
        files[name] = str(d / name)
    return str(d / "*.log"), files


def test_differential_vs_gnu_grep(spark, tmp_path):
    rng = random.Random(20260913)
    glob, files = _corpus(tmp_path, rng)
    ran = Counter()
    for case in range(N_CASES):
        pats = [rng.choice(_PATTERNS) for _ in range(rng.choice([1, 1, 1, 2]))]
        fixed = rng.random() < 0.2
        if fixed:  # fixed-string candidates, not regex syntax
            pats = [rng.choice(_WORDS) for _ in pats]
        kw = dict(
            ignore_case=rng.random() < 0.3,
            invert=rng.random() < 0.2,
            word=rng.random() < 0.25,
            line=rng.random() < 0.15,
            fixed=fixed,
        )
        gargs = ["-F" if fixed else "-E"]
        for flag, on in [
            ("-i", kw["ignore_case"]), ("-v", kw["invert"]),
            ("-w", kw["word"]), ("-x", kw["line"]),
        ]:
            if on:
                gargs.append(flag)
        for p in pats:
            gargs += ["-e", p]
        pat_arg = pats if (len(pats) > 1 or rng.random() < 0.5) else pats[0]

        mode = rng.choice(["lines", "lines", "count", "files", "only"])
        ran[mode] += 1
        if mode == "count":
            maxc = rng.randint(1, 5) if rng.random() < 0.4 else None
            got = {
                (r.source_file, r.match_count)
                for r in dgrep_count(
                    spark, pat_arg, glob, max_count=maxc, **kw
                ).collect()
            }
            want = set()
            for name, path in files.items():
                extra = ["-m", str(maxc)] if maxc else []
                r = subprocess.run(
                    ["grep", "-c"] + extra + gargs + ["--", path],
                    capture_output=True, text=True,
                    env={**os.environ, "LC_ALL": "C"},
                )
                want.add((name, int(r.stdout.strip())))
            assert got == want, (case, gargs, maxc)
        elif mode == "files":
            got = [r.source_file for r in dgrep_files(spark, pat_arg, glob, **kw).collect()]
            want = sorted(
                name for name, path in files.items()
                if subprocess.run(
                    ["grep", "-q"] + gargs + ["--", path],
                    env={**os.environ, "LC_ALL": "C"},
                ).returncode == 0
            )
            assert got == want, (case, gargs)
        elif mode == "only":
            maxc = rng.randint(1, 5) if rng.random() < 0.3 else None
            got = Counter(
                (r.source_file, r.line_no, r.value)
                for r in dgrep(
                    spark, pat_arg, glob, only_matching=True,
                    line_numbers=True, max_count=maxc, **kw
                ).collect()
            )
            want: Counter = Counter()
            for name, path in files.items():
                extra = ["-m", str(maxc)] if maxc else []
                for no, text in _gnu(["-o", "-n"] + extra + gargs, path):
                    want[(name, no, text)] += 1
            assert got == want, (case, gargs, maxc)
        else:  # matched/context lines
            after = rng.randint(1, 3) if rng.random() < 0.3 else 0
            before = rng.randint(1, 3) if rng.random() < 0.3 else 0
            maxc = rng.randint(1, 5) if rng.random() < 0.3 else None
            got = Counter(
                (r.source_file, r.line_no, r.value)
                for r in dgrep(
                    spark, pat_arg, glob, line_numbers=True,
                    after=after, before=before, max_count=maxc, **kw
                ).collect()
            )
            extra = []
            if after:
                extra += ["-A", str(after)]
            if before:
                extra += ["-B", str(before)]
            if maxc:
                extra += ["-m", str(maxc)]
            want = Counter()
            for name, path in files.items():
                for no, text in _gnu(["-n"] + extra + gargs, path):
                    want[(name, no, text)] += 1
            assert got == want, (case, gargs, extra)
    # every mode actually exercised
    assert set(ran) == {"lines", "count", "files", "only"}, ran
