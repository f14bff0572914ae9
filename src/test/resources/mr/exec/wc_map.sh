#!/bin/sh
# Word-count mapper, matching the streaming UDTF contract of the
# reference's wc_map.sh (referenced at submit.py:41-43 but absent from
# the snapshot — authored here as our fixture, SURVEY.md §7.5):
# stdin lines -> one "word\t1" line per whitespace-separated word.
tr -s '[:space:]' '\n' | grep -v '^$' | awk '{print $0 "\t1"}'
