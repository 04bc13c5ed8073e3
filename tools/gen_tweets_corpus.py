"""Generate the deterministic 1M-row tweets CSV used for the SCALE.md §9
single-node throughput comparison (same quirk profile as the reference
input: interior commas, mentions, URLs; label-correlated vocabulary so
the classifiers have signal).

Usage: python tools/gen_tweets_corpus.py [N] [OUT]
Defaults: N=1000000, OUT=/tmp/spark_graft_bench/tweets_1m.csv
"""

import os
import random
import sys


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_bench/tweets_1m.csv"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    random.seed(42)
    vocab_pos = "love great happy sun awesome win smile friend good best nice fun".split()
    vocab_neg = "hate bad sad rain awful lose cry alone worst terrible ugh mad".split()
    fill = "the a to and of in on it is was for with at this that day time work school".split()
    with open(out, "w") as f:
        for i in range(n):
            lab = i % 2
            base = vocab_pos if lab else vocab_neg
            words = [random.choice(base) if random.random() < 0.4 else random.choice(fill)
                     for _ in range(random.randint(6, 18))]
            if random.random() < 0.15:
                words.insert(0, "@user" + str(i % 997))
            if random.random() < 0.10:
                words.append("http://t.co/x" + str(i % 89))
            if random.random() < 0.20:
                words.insert(len(words) // 2, "so,")  # interior comma
            f.write(f"{i},{lab},Sentiment140,{' '.join(words)}\n")
    print(f"wrote {n} rows to {out}")


if __name__ == "__main__":
    main()
