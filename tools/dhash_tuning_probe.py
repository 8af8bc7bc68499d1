"""Measure the dhash_tuning_report cap trade on the sf corpus (VERDICT
r10 ask #6 — the image/audio analogue of the dd_simhash_tuning table):
for each max_bucket cap, candidates generated, pairs verified at
Hamming <= 3, and pairs MISSED vs the uncapped baseline, for FOUR
fingerprint configurations: plain image dHash over documents_as_pgm,
the content-crop variant (image_dhash_content — the padded-corpus
production configuration), the audio envelope hash over
documents_as_wav, and (round 14, VERDICT r13 next-round #7) the video
spatio-temporal projection hash over documents_as_y4m — so all three
Manku-join modalities share one cap-trade report instead of video's
bucket skew living in an ad-hoc r13 measurement. The plain image,
audio and video encodings are the ones the gated mm_image_neardup /
mm_audio_neardup / mm_video_neardup queries attest.

Usage: python tools/dhash_tuning_probe.py [sf_dir ...]
Defaults to /root/testdata/sf0.01 and /root/testdata/sf0.1. Run SOLO
(no concurrent Spark jobs) like any timing probe.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikitrender_spark.operators import multimodal
from wikitrender_spark.session import get_spark


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("dhash-tuning-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        for modality, hashes in (
            ("image", multimodal.image_dhash(multimodal.documents_as_pgm(docs))),
            (
                # the padded-corpus production configuration (round 11):
                # content crop dissolves the flat-padding bucket
                "image-content",
                multimodal.image_dhash_content(multimodal.documents_as_pgm(docs)),
            ),
            (
                "audio",
                multimodal.audio_envelope_hash(multimodal.documents_as_wav(docs)),
            ),
            (
                "video",
                multimodal.video_projection_hash(
                    multimodal.documents_as_y4m(docs)
                ),
            ),
        ):
            t0 = time.monotonic()
            rows = multimodal.dhash_tuning_report(hashes).collect()
            wall = time.monotonic() - t0
            print(f"\n{sf_dir} {modality} ({wall:.2f} s):")
            print("  max_bucket  n_candidates  n_pairs  n_missed")
            for r in rows:
                cap = "uncapped" if r["max_bucket"] == -1 else r["max_bucket"]
                print(
                    f"  {str(cap):>10}  {r['n_candidates']:>12}  "
                    f"{r['n_pairs']:>7}  {r['n_missed']:>8}"
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
