#!/bin/bash
# Prune intermediate checkpoints of a finished run, keeping the
# tensorboard logs, the 'latest' pointer, and epoch 25.
# Reference: experiments/delete_files.sh
set -e
cd "$(dirname "$0")/../models/thumos14/$1"
find . ! -path '*tensorboard*' ! -path "*latest*" ! -path '*25*' -delete
