#!/bin/bash
# Natural Questions retriever eval (examples/evaluate_retriever_nq.sh):
# embed the evidence corpus with the biencoder, MIPS-index it, and report
# top-k answer-containment hit rates on the NQ dev TSV.
set -euo pipefail

QA_FILE=${QA_FILE:?"NQ dev TSV: question<TAB>['answer', ...]"}
EVIDENCE=${EVIDENCE:?"evidence TSV: id<TAB>text<TAB>title"}
VOCAB=${VOCAB:?"BERT wordpiece vocab.txt"}
CKPT=${CKPT:-}

python -m tasks.main --task orqa \
    --qa-data-dev "$QA_FILE" --evidence-data-path "$EVIDENCE" \
    --vocab-file "$VOCAB" ${CKPT:+--load "$CKPT"} \
    --num-layers 12 --hidden-size 768 --num-heads 12 \
    --seq-len 512 --batch-size 128 \
    --report-topk-accuracies 1 5 20 100 "$@"
