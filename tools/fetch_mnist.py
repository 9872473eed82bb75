#!/usr/bin/env python
"""Fetch the MNIST idx files (run where network egress exists; this build
sandbox has none — see ACCURACY_r03.json for the substitute protocol).

    python tools/fetch_mnist.py [dest_dir]
"""

import gzip
import os
import sys
import urllib.request

FILES = [
    "train-images-idx3-ubyte",
    "train-labels-idx1-ubyte",
    "t10k-images-idx3-ubyte",
    "t10k-labels-idx1-ubyte",
]
MIRRORS = [
    "https://storage.googleapis.com/cvdf-datasets/mnist/",
    "https://ossci-datasets.s3.amazonaws.com/mnist/",
]


def main():
    dest = sys.argv[1] if len(sys.argv) > 1 else "mnist"
    os.makedirs(dest, exist_ok=True)
    for name in FILES:
        out = os.path.join(dest, name)
        if os.path.exists(out):
            print(f"{out} exists")
            continue
        last = None
        for base in MIRRORS:
            url = base + name + ".gz"
            try:
                print(f"fetching {url}")
                with urllib.request.urlopen(url, timeout=60) as r:
                    data = gzip.decompress(r.read())
                with open(out, "wb") as f:
                    f.write(data)
                break
            except Exception as e:  # try next mirror
                last = e
        else:
            raise SystemExit(f"all mirrors failed for {name}: {last}")
    print(f"MNIST idx files ready under {dest}/")


if __name__ == "__main__":
    main()
