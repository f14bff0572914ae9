#!/bin/sh
# TRANSFORM fixture: uppercase the second tab-separated field.
awk -F'\t' '{ print $1 "\t" toupper($2) }'
