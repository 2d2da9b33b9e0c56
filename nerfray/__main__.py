"""CLI mirroring the reference's modes (/root/reference/app/Main.hs:59-107):

    python -m nerfray train  GOLD.nes -o model.bin [--iter N]
    python -m nerfray cv     GOLD.nes -k K [--iter N]
    python -m nerfray ner    model.bin [FILE]       # default: stdin lines
    python -m nerfray compare GOLD.nes PRED.nes
    python -m nerfray ox     [FILE]                 # observation dump

``server``/``client`` are intentionally absent: the resident-model server
exists to amortize model loading (reference README.md:123-127), which the
actor-pool pipeline already provides (SURVEY.md §7.5). Ray is initialised
lazily only by modes that need it (none of these do — the CLI is the
single-node kernel surface; the Ray surface is ``nerfray.pipelines``).
"""

from __future__ import annotations

import argparse
import sys


def _read_gold(path: str):
    """ENAMEX file -> [(words, token spans)] (reference readDeep)."""
    from .core import enamex
    out = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line:
                out.append(enamex.parse(line))
    return out


def _encode_gold(gold, conf):
    from .core import iob, schema
    sents, labels = [], []
    for words, spans in gold:
        stacks = iob.encode(spans, len(words))
        sents.append(schema.schematize(conf, words))
        labels.append([iob.stack_to_str(s) for s in stacks])
    return sents, labels


def cmd_train(args) -> int:
    from . import model
    from .core import crf
    conf = model.make_schema_conf()
    gold = _read_gold(args.gold)
    sents, labels = _encode_gold(gold, conf)
    sgd = crf.SgdArgs(iter_num=args.iter)
    m = crf.train(sents, labels, sgd)
    blob = model.serialize(m, conf)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"trained on {len(gold)} sentences -> {args.out} "
          f"({len(blob)} bytes, {len(m.labels)} labels, "
          f"{len(m.obs_vocab)} observations)")
    return 0


def cmd_cv(args) -> int:
    from . import model
    from .core import compare, crf, iob, schema, tokenize
    gold = _read_gold(args.gold)
    conf = model.make_schema_conf()
    folds = [gold[f::args.k] for f in range(args.k)]
    for f in range(args.k):
        train_g = [g for j in range(args.k) if j != f for g in folds[j]]
        sents, labels = _encode_gold(train_g, conf)
        m = crf.train(sents, labels, crf.SgdArgs(iter_num=args.iter))
        tagger_stats = []
        for words, spans in folds[f]:
            obs = schema.schematize(conf, words)
            stacks = [iob.stack_from_str(s) for s in m.viterbi(obs)]
            pred = iob.decode(stacks)
            text = " ".join(words)
            # token spans -> char spans over the joined text
            bounds, pos = [], 0
            for w in words:
                bounds.append((pos, pos + len(w)))
                pos += len(w) + 1
            to_char = lambda sps: [
                (s.label, bounds[s.start][0], bounds[s.end - 1][1])
                for s in sps]
            tagger_stats.append(
                compare.unit_stats(text, to_char(spans), to_char(pred)))
        merged = compare.merge(tagger_stats)
        tp = sum(v[0] for v in merged.values())
        fp = sum(v[1] for v in merged.values())
        fn = sum(v[2] for v in merged.values())
        p, r, fsc = compare.prf(tp, fp, fn)
        print(f"fold {f}: n={len(folds[f])} tp={tp} fp={fp} fn={fn} "
              f"P={p:.4f} R={r:.4f} F={fsc:.4f}")
    return 0


def cmd_ner(args) -> int:
    from . import model
    from .core import enamex
    from .core.tokenize import tokenize
    with open(args.model, "rb") as f:
        m, conf = model.deserialize(f.read())
    tagger = model.Tagger(m, conf)
    stream = open(args.input) if args.input else sys.stdin
    for line in stream:
        line = line.rstrip("\n")
        spans = tagger.tag(line)
        toks = tokenize(line)
        tspans = model.char_spans_to_token_spans(toks, spans)
        print(enamex.render([t.text for t in toks], tspans))
    return 0


def cmd_compare(args) -> int:
    from .core import compare
    a = _read_gold(args.reference)
    b = _read_gold(args.compared)
    if len(a) != len(b):
        print(f"corpora not aligned: {len(a)} vs {len(b)} sentences",
              file=sys.stderr)
        return 1
    stats = []
    for (wa, sa), (wb, sb) in zip(a, b):
        text = " ".join(wa)
        bounds, pos = [], 0
        for w in wa:
            bounds.append((pos, pos + len(w)))
            pos += len(w) + 1
        to_char = lambda sps, bs: [
            (s.label, bs[s.start][0], bs[s.end - 1][1]) for s in sps
            if s.end - 1 < len(bs)]
        bounds_b, pos = [], 0
        for w in wb:
            bounds_b.append((pos, pos + len(w)))
            pos += len(w) + 1
        stats.append(compare.unit_stats(text, to_char(sa, bounds),
                                        to_char(sb, bounds_b)))
    merged = compare.merge(stats)
    tot = [0, 0, 0]
    for lbl in sorted(merged):
        tp, fp, fn = merged[lbl]
        p, r, f = compare.prf(tp, fp, fn)
        print(f"{lbl}: tp={tp} fp={fp} fn={fn} P={p:.4f} R={r:.4f} "
              f"F={f:.4f}")
        tot[0] += tp
        tot[1] += fp
        tot[2] += fn
    p, r, f = compare.prf(*tot)
    print(f"<all>: tp={tot[0]} fp={tot[1]} fn={tot[2]} P={p:.4f} "
          f"R={r:.4f} F={f:.4f}")
    return 0


def cmd_ox(args) -> int:
    from . import model
    from .core import schema
    from .core.tokenize import tokenize
    conf = model.make_schema_conf()
    stream = open(args.input) if args.input else sys.stdin
    for line in stream:
        words = [t.text for t in tokenize(line.rstrip("\n"))]
        if not words:
            print()
            continue
        for w, obs in zip(words, schema.schematize(conf, words)):
            print(f"{w}\t{' '.join(sorted(obs))}")
        print()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nerfray")
    sub = p.add_subparsers(dest="mode", required=True)

    t = sub.add_parser("train")
    t.add_argument("gold")
    t.add_argument("-o", "--out", required=True)
    t.add_argument("--iter", type=int, default=10)
    t.set_defaults(fn=cmd_train)

    c = sub.add_parser("cv")
    c.add_argument("gold")
    c.add_argument("-k", type=int, default=3)
    c.add_argument("--iter", type=int, default=4)
    c.set_defaults(fn=cmd_cv)

    n = sub.add_parser("ner")
    n.add_argument("model")
    n.add_argument("input", nargs="?")
    n.set_defaults(fn=cmd_ner)

    cp = sub.add_parser("compare")
    cp.add_argument("reference")
    cp.add_argument("compared")
    cp.set_defaults(fn=cmd_compare)

    o = sub.add_parser("ox")
    o.add_argument("input", nargs="?")
    o.set_defaults(fn=cmd_ox)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
