#!/bin/sh
# Word-count reducer, matching the reference's streaming sorted-group
# contract (worker/__main__.py:200-202): stdin is key-sorted
# "word\tcount" lines with equal keys contiguous; emit one
# "word\ttotal" line per key group.
awk -F'\t' '
  $1 != k { if (seen) print k "\t" n; k = $1; n = 0; seen = 1 }
  { n += $2 }
  END { if (seen) print k "\t" n }'
