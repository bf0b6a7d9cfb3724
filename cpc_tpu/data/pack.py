"""CLI: pack an audio corpus into the pre-decoded memmap format.

    python -m cpc_tpu.data.pack <corpus_dir> <packed_dir> [--rate 16000]

See cpc_tpu.data.packed for the on-disk layout; point the training CLI at
the result with --data <packed_dir> --packed.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="cpc_tpu.data.pack")
    p.add_argument("corpus_dir")
    p.add_argument("packed_dir")
    p.add_argument("--rate", type=int, default=16_000)
    args = p.parse_args(argv)

    from cpc_tpu.data.packed import pack_corpus
    meta = pack_corpus(args.corpus_dir, args.packed_dir, args.rate)
    print(json.dumps({"files": len(meta["files"]),
                      "total_samples": meta["total_samples"],
                      "hours": round(meta["total_samples"]
                                     / meta["sample_rate"] / 3600, 3),
                      "has_phones": meta["has_phones"],
                      "out": args.packed_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
