#!/usr/bin/env python
"""Fetch CIFAR-10 (binary version) — run where network egress exists; this
build sandbox has none, so ACCURACY_r03.json documents the substitute
protocol (the real-handwritten digits set at CIFAR geometry).

    python tools/fetch_cifar.py [dest_dir]

Writes data_batch_{1..5}.bin / test_batch.bin as mandheling_tpu.data.cifar
expects (1 label byte + 3072 CHW image bytes per record).
"""

import io
import os
import sys
import tarfile
import urllib.request

URL = "https://www.cs.toronto.edu/~kriz/cifar-10-binary.tar.gz"


def main():
    dest = sys.argv[1] if len(sys.argv) > 1 else "cifar10"
    os.makedirs(dest, exist_ok=True)
    names = [f"data_batch_{i}.bin" for i in range(1, 6)] + ["test_batch.bin"]
    if all(os.path.exists(os.path.join(dest, n)) for n in names):
        print(f"{dest}: all CIFAR-10 binaries present")
        return
    print(f"fetching {URL}")
    with urllib.request.urlopen(URL, timeout=120) as r:
        buf = io.BytesIO(r.read())
    with tarfile.open(fileobj=buf, mode="r:gz") as tf:
        for member in tf.getmembers():
            base = os.path.basename(member.name)
            if base in names:
                with tf.extractfile(member) as src, \
                        open(os.path.join(dest, base), "wb") as dst:
                    dst.write(src.read())
                print(f"wrote {dest}/{base}")


if __name__ == "__main__":
    main()
