"""bgzip CLI (reference bgzip.c:217): block compress/decompress with
random access, .gzi indexing, test mode and byte-identical rebgzip."""
from __future__ import annotations

import argparse
import os
import sys

from htslib_tpu.bgzf import (BGZFReader, BGZFWriter, GziIndex, deflate_blocks,
                             BGZF_BLOCK_SIZE, BGZF_EOF)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="bgzip", description=__doc__)
    p.add_argument("-d", "--decompress", action="store_true")
    p.add_argument("-c", "--stdout", action="store_true")
    p.add_argument("-f", "--force", action="store_true")
    p.add_argument("-i", "--index", action="store_true",
                   help="compress and create a .gzi index")
    p.add_argument("-I", "--index-name")
    p.add_argument("-b", "--offset", type=int,
                   help="decompress from virtual file offset")
    p.add_argument("-s", "--size", type=int, default=-1,
                   help="decompress SIZE bytes with -b")
    p.add_argument("-t", "--test", action="store_true")
    p.add_argument("-g", "--rebgzip", action="store_true",
                   help="recompress using an existing .gzi for "
                        "byte-identical blocks")
    p.add_argument("-l", "--compress-level", type=int, default=-1)
    p.add_argument("-k", "--keep", action="store_true")
    p.add_argument("-@", "--threads", type=int, default=1)
    p.add_argument("file", nargs="?")
    a = p.parse_args(argv)

    src = a.file or "-"
    if a.test:
        with BGZFReader(src) as r:
            if not r.is_bgzf:
                print(f"{src}: not BGZF", file=sys.stderr)
                return 1
            while r.read(1 << 20):
                pass
            ok = r.check_eof()
        return 0 if ok in (1, 2) else 1

    if a.offset is not None:
        with BGZFReader(src) as r:
            r.load_index(a.index_name)
            r.useek(a.offset)
            data = r.read(a.size if a.size >= 0 else -1)
        sys.stdout.buffer.write(data)
        return 0

    if a.decompress:
        out = "-" if (a.stdout or src == "-") else src[:-3] \
            if src.endswith(".gz") else src + ".out"
        if out != "-" and os.path.exists(out) and not a.force:
            print(f"{out} already exists; use -f to overwrite",
                  file=sys.stderr)
            return 1
        with BGZFReader(src) as r:
            sink = sys.stdout.buffer if out == "-" else open(out, "wb")
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                sink.write(chunk)
            if out != "-":
                sink.close()
                if not a.keep and src != "-":
                    os.unlink(src)
        return 0

    # compress
    out = "-" if (a.stdout or src == "-") else src + ".gz"
    if out != "-" and os.path.exists(out) and not a.force:
        print(f"{out} already exists; use -f to overwrite", file=sys.stderr)
        return 1
    data = sys.stdin.buffer.read() if src == "-" else open(src, "rb").read()
    if a.rebgzip:
        # reproduce the original block sizes from the .gzi index
        gzi = GziIndex.load(a.index_name or src + ".gz.gzi")
        bounds = [int(u) for u in gzi.uoffsets] + [len(data)]
        chunks = [data[bounds[i]:bounds[i + 1]]
                  for i in range(len(bounds) - 1) if bounds[i + 1] > bounds[i]]
    else:
        chunks = [data[i:i + BGZF_BLOCK_SIZE]
                  for i in range(0, len(data), BGZF_BLOCK_SIZE)]
    blocks = deflate_blocks(chunks, a.compress_level)
    sink = sys.stdout.buffer if out == "-" else open(out, "wb")
    co, uo = [0], [0]
    for raw, blk in zip(chunks, blocks):
        sink.write(blk)
        co.append(co[-1] + len(blk))
        uo.append(uo[-1] + len(raw))
    sink.write(BGZF_EOF)
    if out != "-":
        sink.close()
        if not a.keep and src != "-":
            os.unlink(src)
    if a.index:
        import numpy as np
        idx = GziIndex(np.array(co[:-1], np.uint64), np.array(uo[:-1], np.uint64))
        idx.save(a.index_name or (out if out != "-" else src) + ".gzi")
    return 0


if __name__ == "__main__":
    sys.exit(main())
