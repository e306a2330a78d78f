"""Engine CLI — the surface a reference user lands on (run.sh parity).

    python -m stream_processing_spark.cli rainstorm "<op1>" "<op2>" <in> <out> [n] [stateful]
    python -m stream_processing_spark.cli dgrep <pattern> <glob> [-c]
    python -m stream_processing_spark.cli store <create|append|merge|get|ls|list> <root> [args…]

Reference: run.sh:105-140 dispatches create/append/get/merge/ls/store/
multiappend/Rainstorm/dgrep to the four layers; this module is the same
dispatch onto the Spark-first engine.
"""

from __future__ import annotations

import sys

from stream_processing_spark.session import get_spark


def _rainstorm(args: list[str]) -> int:
    from stream_processing_spark.plans import rainstorm

    source = "files"
    if args and args[0] == "--tail":  # tail growing file(s)/glob (linetail)
        source = "tail"
        args = args[1:]
    op1, op2, ind, outd = args[:4]
    n = int(args[4]) if len(args) > 4 else None
    stateful = len(args) > 5 and args[5].lower() in ("1", "true", "stateful")
    job = rainstorm(
        get_spark(), op1, op2, ind, outd, n, stateful or None, source=source
    )
    job.run_to_completion()
    print(f"output at {outd}")
    return 0


def _dgrep(args: list[str]) -> int:
    """dgrep [-i] [-v] [-c] [-n] [-w] [-x] [-F] [-o] [-l]
    [-A n] [-B n] [-C n] [-m n] [-e pat]... <pattern> <glob>

    The reference passes raw grep flags through the shell
    (src/LogQuerier/server.py:30-33); this parses the same flags onto
    the DataFrame plan.
    """
    from stream_processing_spark.sources.grep import (
        dgrep,
        dgrep_count,
        dgrep_files,
    )

    flags = {"i": False, "v": False, "c": False, "n": False,
             "w": False, "x": False, "F": False, "o": False, "l": False}
    after = before = context = 0
    max_count: int | None = None
    pos: list[str] = []
    pats: list[str] = []
    it = iter(args)
    try:
        for a in it:
            if a == "-e":  # -e p1 -e p2 ... (any-match, GNU grep)
                operand = next(it, None)
                if operand is None:
                    raise SystemExit("dgrep: -e requires a pattern")
                pats.append(operand)
            elif a in ("-A", "-B", "-C", "-m"):
                operand = next(it, None)
                if operand is None or not operand.isdigit():
                    raise SystemExit(f"dgrep: {a} requires a count, e.g. '{a} 2'")
                if a == "-A":
                    after = int(operand)
                elif a == "-B":
                    before = int(operand)
                elif a == "-C":
                    context = int(operand)
                else:
                    max_count = int(operand)
            elif a.startswith("-") and len(a) > 1 and all(ch in flags for ch in a[1:]):
                for ch in a[1:]:
                    flags[ch] = True
            else:
                pos.append(a)
        if pats:
            pattern, (glob,) = pats, pos
        else:
            pattern, glob = pos
    except ValueError:
        raise SystemExit(
            "usage: dgrep [-i] [-v] [-c] [-n] [-w] [-x] [-F] [-o] [-l] "
            "[-A n] [-B n] [-C n] [-m n] <pattern> <glob>"
        ) from None
    kw = dict(
        ignore_case=flags["i"], invert=flags["v"], word=flags["w"],
        line=flags["x"], fixed=flags["F"],
    )
    spark = get_spark()
    if flags["l"]:
        for r in dgrep_files(spark, pattern, glob, **kw).collect():
            print(r.source_file)
    elif flags["c"]:
        rows = dgrep_count(spark, pattern, glob, max_count=max_count, **kw).collect()
        total = 0
        for r in rows:
            print(f"{r.source_file}: {r.match_count}")
            total += r.match_count
        print(f"TOTAL: {total}")  # reference client.py:151-152
    else:
        rows = dgrep(
            spark, pattern, glob,
            line_numbers=flags["n"], after=after, before=before,
            context=context, max_count=max_count,
            only_matching=flags["o"], **kw,
        ).collect()
        for r in rows:
            if flags["n"]:
                print(f"{r.source_file}:{r.line_no}: {r.value}")
            else:
                print(f"{r.source_file}: {r.value}")
    return 0


def _store(args: list[str]) -> int:
    from stream_processing_spark.store import Store

    cmd, root, rest = args[0], args[1], args[2:]
    store = Store(get_spark(), root)
    if cmd == "create":
        name, local = rest
        store.create(name, open(local).read().splitlines())
    elif cmd == "append":
        name, local = rest[:2]
        writer = rest[2] if len(rest) > 2 else "cli"
        store.append(name, open(local).read().splitlines(), writer=writer)
    elif cmd == "multiappend":
        # multiappend <name> <local1> <local2> … — concurrent appends,
        # one per file (reference bin/multiappend.py: one per VM)
        name, locals_ = rest[0], rest[1:]
        store.multiappend(
            name,
            {
                f"w{i}": open(p).read().splitlines()
                for i, p in enumerate(locals_)
            },
        )
    elif cmd == "merge":
        store.merge(rest[0])
    elif cmd == "get":
        name = rest[0]
        out = "\n".join(store.get_lines(name))
        if len(rest) > 1:
            with open(rest[1], "w") as f:
                f.write(out + "\n")
        else:
            print(out)
    elif cmd == "ls":
        print(store.ls(rest[0]))
    elif cmd == "delete":
        store.delete(rest[0])
        print(f"deleted {rest[0]}")
    elif cmd == "list":
        print("\n".join(store.datasets()))
    else:
        raise SystemExit(f"unknown store command {cmd!r}")
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 2
    cmd, rest = argv[0].lower(), argv[1:]
    if cmd == "rainstorm":
        return _rainstorm(rest)
    if cmd == "tail":
        # tail <src_file> <spool_dir> [poll_sec] — bridge a single
        # append-only file into the micro-file directory a StreamJob
        # consumes (reference worker.py:503-511 tail-forever mode)
        from stream_processing_spark.streaming.tailer import FileTailer

        src, spool = rest[0], rest[1]
        poll = float(rest[2]) if len(rest) > 2 else 0.5
        print(f"tailing {src} -> {spool} every {poll}s (ctrl-c to stop)")
        FileTailer(src, spool).run(poll_interval=poll)
        return 0
    if cmd == "dgrep":
        return _dgrep(rest)
    if cmd in ("store", "create", "append", "multiappend", "merge", "get", "ls", "delete"):
        return _store(rest if cmd == "store" else [cmd, *rest])
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
