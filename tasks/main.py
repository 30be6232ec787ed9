#!/usr/bin/env python
"""Downstream task harness.

The reference's tasks/main.py dispatches finetune/eval jobs by --task
(GLUE/RACE for BERT, zero-shot GPT eval, vision classify). Here:

  --task zeroshot-imagenet : zero-shot classification of an ImageFolder dir
  --task retrieval         : image<->text recall@K over a CSV dataset
  --task linear-probe      : logistic-regression probe of frozen CLIP
                             features on an ImageFolder dir
  --task glue              : BERT sentence(-pair) classification finetune
                             from TSV (label\tsent1[\tsent2]) — the
                             MNLI/QQP-style jobs of the reference harness
  --task race              : BERT multiple-choice finetune from JSONL
                             ({context, question, options[4], label})

  python tasks/main.py --task zeroshot-imagenet --model ViT-B-32 \
      --load-torch epoch_32.pt --data-dir /data/imagenet/val
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser("downstream tasks")
    p.add_argument("--task", required=True,
                   choices=["zeroshot-imagenet", "retrieval", "linear-probe",
                            "glue", "race", "wikitext103", "lambada",
                            "msdp-prompt", "msdp-eval-f1",
                            "orqa", "orqa-finetune",
                            "vision-classify", "vision-segment"])
    p.add_argument("--model", default="ViT-B-32")
    p.add_argument("--pretrained", default="", help="open_CLIP .pt file")
    p.add_argument("--load", default="", help="orbax checkpoint root")
    p.add_argument("--data-dir", help="ImageFolder dir (zeroshot/linear-probe)")
    p.add_argument("--csv", help="csv with filepath/title (retrieval)")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--probe-epochs", type=int, default=10)
    # --- glue/race finetune ---------------------------------------------
    p.add_argument("--train-file", help="TSV (glue) / JSONL (race)")
    p.add_argument("--dev-file")
    p.add_argument("--vocab-file", help="BERT wordpiece vocab.txt")
    p.add_argument("--num-classes", type=int, default=None,
                   help="glue: label count (default 2); vision-segment: "
                        "mask classes (default 21, VOC-style)")
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--num-heads", type=int, default=12)
    p.add_argument("--probe-lr", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-predictions", default="",
                   help="write dev-set probabilities to this .npz for "
                        "tasks/ensemble_classifier.py (reference saves "
                        "test_predictions.pt per checkpoint dir)")
    p.add_argument("--dataset-name", default="dev",
                   help="dataset key stored in --save-predictions")
    # --- vision classify/segment (reference tasks/vision) ----------------
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--ignore-index", type=int, default=255,
                   help="segmentation ignore label (cityscapes.py)")
    p.add_argument("--seg-dataset", choices=["folder", "cityscapes"],
                   default="folder",
                   help="folder = images/+masks/ pairs; cityscapes = the "
                        "official leftImg8bit/gtFine layout with the "
                        "labelId->trainId remap (19 classes, ignore 19)")
    p.add_argument("--seg-split", default="train",
                   help="cityscapes split directory (train/val)")
    p.add_argument("--seg-arch", choices=["segformer", "setr"],
                   default="segformer",
                   help="segformer = MiT backbone + all-MLP head "
                        "(finetune_segformer.py); setr = plain ViT + "
                        "progressive-upsampling head (finetune_setr.py)")
    p.add_argument("--seg-embed-dim", type=int, default=256)
    p.add_argument("--seg-dims", type=int, nargs=4, default=None,
                   help="MiT stage widths (default 32 64 160 256)")
    p.add_argument("--seg-depths", type=int, nargs=4, default=None)
    # --- zero-shot GPT eval (reference tasks/zeroshot_gpt) ---------------
    p.add_argument("--valid-data", help="text file (wikitext103) / "
                                        "jsonl (lambada)")
    p.add_argument("--overlapping-eval", type=int, default=32,
                   help="LM-eval window stride (megatron --overlapping-eval)")
    p.add_argument("--strict-lambada", action="store_true")
    p.add_argument("--merge-file", help="GPT2 BPE merges.txt")
    p.add_argument("--vocab-size", type=int, default=None,
                   help="override model vocab (defaults to padded tokenizer)")
    # --- msdp (reference tasks/msdp/main.py flags) -----------------------
    p.add_argument("--sample-input-file")
    p.add_argument("--sample-output-file")
    p.add_argument("--prompt-file")
    p.add_argument("--prompt-type", choices=["knowledge", "response"])
    p.add_argument("--num-prompt-examples", type=int, default=10)
    p.add_argument("--guess-file")
    p.add_argument("--answer-file")
    p.add_argument("--out-seq-length", type=int, default=100)
    p.add_argument("--megatron-api-url",
                   help="PUT endpoint of a running text-generation server; "
                        "if unset, decodes locally with --load/--vocab-file")
    # --- orqa (reference tasks/orqa flags) -------------------------------
    p.add_argument("--qa-data-dev", help="NQ TSV: question\\t['answer',...]")
    p.add_argument("--evidence-data-path",
                   help="evidence TSV: id\\ttext\\ttitle")
    p.add_argument("--qa-train-file", help="DPR-style JSON for "
                                           "orqa-finetune")
    p.add_argument("--report-topk-accuracies", type=int, nargs="+",
                   default=[1, 5, 10])
    p.add_argument("--match", choices=["string", "regex"], default="string")
    p.add_argument("--save-to", default="",
                   help="orbax root to save finetuned params (orqa-finetune)")
    return p.parse_args(argv)


def _load_evidence_tsv(path):
    docs = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("id\t"):
                continue
            parts = line.split("\t")
            docs[parts[0]] = (parts[1], parts[2] if len(parts) > 2 else "")
    return docs


def run_msdp(args):
    """MSDP dispatch (reference tasks/msdp/main.py:57-63)."""
    from tasks import msdp
    if args.task == "msdp-eval-f1":
        return msdp.evaluate_f1(args.guess_file, args.answer_file)
    if args.megatron_api_url:
        gen_fn = msdp.api_generate_fn(args.megatron_api_url)
    else:
        import jax
        from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt
        from megatron_clip_tpu.tokenizer.megatron_tokenizers import (
            GPT2BPETokenizer, NullTokenizer, vocab_size_with_padding)
        if args.vocab_file and args.merge_file:
            tok = GPT2BPETokenizer(args.vocab_file, args.merge_file)
        else:
            tok = NullTokenizer(8192)
        vocab = args.vocab_size or vocab_size_with_padding(tok.vocab_size)
        cfg = GPTCfg(num_layers=args.num_layers, hidden_size=args.hidden_size,
                     num_heads=args.num_heads, vocab_size=vocab,
                     seq_length=args.seq_len)
        params = init_gpt(jax.random.PRNGKey(args.seed), cfg)
        if args.load:
            from megatron_clip_tpu.checkpoints import load_checkpoint
            tree, _, _ = load_checkpoint(args.load, {"params": params})
            params = tree["params"]
        gen_fn = msdp.local_generate_fn(params, cfg, tok, eod=tok.eod)
    n = msdp.generate_samples(
        args.sample_input_file, args.sample_output_file,
        prompt_file=args.prompt_file, prompt_type=args.prompt_type,
        generate_fn=gen_fn, num_prompt_examples=args.num_prompt_examples,
        out_seq_length=args.out_seq_length)
    print({"generated": n, "output": args.sample_output_file})
    return {"generated": n}


def run_orqa(args):
    """ORQA dispatch (reference tasks/orqa/evaluate_orqa.py,
    supervised/finetune.py)."""
    import jax
    from tasks import orqa
    from megatron_clip_tpu.models.biencoder import (
        BiencoderCfg, init_biencoder)
    from megatron_clip_tpu.models.bert import BertCfg
    from megatron_clip_tpu.tokenizer.megatron_tokenizers import (
        BertWordPieceTokenizer)
    if args.vocab_file:
        tok = BertWordPieceTokenizer(args.vocab_file)
        tokenize = tok.tokenize
        vocab = max(tok.vocab_size, 32)
    else:
        # no vocab supplied: stable hashing tokenizer (random-weights smoke
        # path; real evals pass --vocab-file)
        import hashlib
        vocab = 8192

        def tokenize(text):
            return [int(hashlib.md5(w.encode()).hexdigest()[:6], 16)
                    % (vocab - 1) + 1 for w in text.lower().split()]
    cfg = BiencoderCfg(bert=BertCfg(
        num_layers=args.num_layers, hidden_size=args.hidden_size,
        num_heads=args.num_heads, vocab_size=vocab,
        seq_length=args.seq_len, add_binary_head=False))
    params = init_biencoder(jax.random.PRNGKey(args.seed), cfg)
    if args.load:
        from megatron_clip_tpu.checkpoints import load_checkpoint
        tree, _, _ = load_checkpoint(args.load, {"params": params})
        params = tree["params"]

    if args.task == "orqa-finetune":
        pairs = orqa.load_dpr_json(args.qa_train_file)
        params, acc = orqa.finetune_biencoder(
            params, cfg, pairs, tokenize, seq_len=args.seq_len,
            batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
            seed=args.seed)
        out = {"in_batch_top1": round(acc, 4), "pairs": len(pairs)}
        if args.save_to:
            from megatron_clip_tpu.checkpoints import save_checkpoint
            save_checkpoint(args.save_to, 0, {"params": params}, {})
        print(out)
        return out

    docs = _load_evidence_tsv(args.evidence_data_path)
    questions, answers = orqa.load_nq_tsv(args.qa_data_dev)
    ev = orqa.ORQAEvaluator(params, cfg, tokenize, seq_len=args.seq_len,
                            batch_size=args.batch_size).build_index(docs)
    res = ev.evaluate(questions, answers, docs,
                      top_k=max(args.report_topk_accuracies),
                      match_type=args.match)
    out = {f"top{k}_hit_rate": round(res.hit_rate(k), 4)
           for k in args.report_topk_accuracies}
    out["num_questions"] = res.num_questions
    print(out)
    return out


def run_zeroshot_gpt(args):
    """WIKITEXT103 / LAMBADA eval of a GPT checkpoint
    (reference tasks/zeroshot_gpt/evaluate.py main())."""
    from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt
    from megatron_clip_tpu.tokenizer.megatron_tokenizers import (
        GPT2BPETokenizer, NullTokenizer, vocab_size_with_padding)
    from tasks.zeroshot_gpt import (
        evaluate_wikitext, evaluate_lambada, load_lambada)
    import jax

    if args.vocab_file and args.merge_file:
        tok = GPT2BPETokenizer(args.vocab_file, args.merge_file)
    else:
        tok = NullTokenizer(8192)
    vocab = args.vocab_size or vocab_size_with_padding(tok.vocab_size)
    cfg = GPTCfg(num_layers=args.num_layers, hidden_size=args.hidden_size,
                 num_heads=args.num_heads, vocab_size=vocab,
                 seq_length=args.seq_len)
    params = init_gpt(jax.random.PRNGKey(args.seed), cfg)
    if args.load:
        from megatron_clip_tpu.checkpoints import load_checkpoint
        tree, _, _ = load_checkpoint(args.load, {"params": params})
        params = tree["params"]

    if args.task == "wikitext103":
        with open(args.valid_data, "rb") as f:
            text = f.read().decode("utf-8")
        m = evaluate_wikitext(params, cfg, text, tok.tokenize,
                              seq_len=args.seq_len,
                              overlapping_eval=args.overlapping_eval,
                              batch_size=args.batch_size, pad_id=tok.eod)
    else:
        examples = load_lambada(args.valid_data, tok.tokenize,
                                strict=args.strict_lambada)
        m = evaluate_lambada(params, cfg, examples, seq_len=args.seq_len,
                             batch_size=args.batch_size, pad_id=tok.eod)
    print({k: round(v, 6) if isinstance(v, float) else v
           for k, v in m.items()})
    return m


def _load_model(args):
    import jax
    from megatron_clip_tpu.factory import create_model
    model, params = create_model(args.model, seed=args.seed)
    if args.pretrained:
        from megatron_clip_tpu.checkpoints.torch_interop import load_openclip_checkpoint
        params = load_openclip_checkpoint(args.pretrained, model.cfg)
    elif args.load:
        from megatron_clip_tpu.checkpoints import load_checkpoint
        tree, _, _ = load_checkpoint(args.load, {"params": params})
        params = tree["params"]
    return model, params


def run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.task in ("wikitext103", "lambada"):
        return run_zeroshot_gpt(args)

    if args.task in ("msdp-prompt", "msdp-eval-f1"):
        return run_msdp(args)

    if args.task in ("orqa", "orqa-finetune"):
        return run_orqa(args)

    if args.task == "vision-classify":
        from tasks.vision import run_vision_classify
        return run_vision_classify(args)

    if args.task == "vision-segment":
        from tasks.vision import run_vision_segment
        return run_vision_segment(args)

    if args.task in ("glue", "race"):
        from megatron_clip_tpu.models.bert import BertCfg
        from megatron_clip_tpu.tokenizer.megatron_tokenizers import (
            BertWordPieceTokenizer)
        from tasks.finetune import run_glue, run_race
        tok = BertWordPieceTokenizer(args.vocab_file)
        cfg = BertCfg(num_layers=args.num_layers,
                      hidden_size=args.hidden_size, num_heads=args.num_heads,
                      vocab_size=max(tok.vocab_size, 32),
                      seq_length=args.seq_len, add_binary_head=False)
        fn = run_glue if args.task == "glue" else run_race
        kw = dict(seq_len=args.seq_len, epochs=args.epochs,
                  batch_size=args.batch_size, lr=args.lr, seed=args.seed)
        if args.task == "glue":
            kw["num_classes"] = args.num_classes or 2
        res, _ = fn(tok, cfg, args.train_file, args.dev_file, **kw)
        if args.save_predictions:
            import numpy as np
            np.savez(args.save_predictions, name=args.dataset_name,
                     probs=res.dev_probs, labels=res.dev_labels,
                     uid=np.arange(len(res.dev_labels)))
        out = {"train_loss": round(res.train_loss, 4),
               "dev_accuracy": round(res.dev_accuracy, 4)}
        print(out)
        return out

    model, params = _load_model(args)
    from megatron_clip_tpu.tokenizer import get_tokenizer

    if args.task == "zeroshot-imagenet":
        from megatron_clip_tpu.evaluation import (
            build_zero_shot_classifier, zero_shot_eval)
        from megatron_clip_tpu.evaluation.zero_shot import (
            load_imagenet_metadata, SIMPLE_IMAGENET_TEMPLATES)
        from megatron_clip_tpu.data.image_folder import (
            image_folder_batches, scan_image_folder)
        names, templates = load_imagenet_metadata()
        _, folder_names = scan_image_folder(args.data_dir)
        if names is None or len(folder_names) != len(names):
            names, templates = folder_names, SIMPLE_IMAGENET_TEMPLATES
        clf = build_zero_shot_classifier(model, params, names, templates,
                                         get_tokenizer(), batch_size=64)
        m = zero_shot_eval(model, params, clf, image_folder_batches(
            args.data_dir, args.batch_size, model.image_size,
            is_train=False, epochs=1))
        print(m)
        return m

    if args.task == "retrieval":
        from megatron_clip_tpu.evaluation import contrastive_eval_metrics
        from megatron_clip_tpu.data.loaders import CsvData
        from megatron_clip_tpu.data.transforms import image_transform
        ds = CsvData(args.csv, args.batch_size,
                     image_transform(model.image_size, False),
                     get_tokenizer(), shuffle=False,
                     context_length=model.context_length)
        m = contrastive_eval_metrics(model, params, ds)
        print({k: round(v, 4) for k, v in m.items()})
        return m

    if args.task == "linear-probe":
        import optax
        from megatron_clip_tpu.data.image_folder import (
            image_folder_batches, scan_image_folder)
        _, classes = scan_image_folder(args.data_dir)
        enc = jax.jit(lambda p, im: model.encode_image(p, im))
        feats, labels = [], []
        for im, lb in image_folder_batches(args.data_dir, args.batch_size,
                                           model.image_size, is_train=False,
                                           epochs=1):
            feats.append(np.asarray(enc(params, jnp.asarray(im))))
            labels.append(lb)
        x = jnp.asarray(np.concatenate(feats))
        y = jnp.asarray(np.concatenate(labels))
        w = jnp.zeros((x.shape[1], len(classes)))
        b = jnp.zeros((len(classes),))
        tx = optax.adam(args.probe_lr)
        st = tx.init((w, b))

        @jax.jit
        def step(wb, st):
            def loss(wb):
                logits = x @ wb[0] + wb[1]
                from megatron_clip_tpu.ops.cross_entropy import cross_entropy
                return cross_entropy(logits, y).mean()
            l, g = jax.value_and_grad(loss)(wb)
            up, st = tx.update(g, st)
            return optax.apply_updates(wb, up), st, l

        wb = (w, b)
        for _ in range(args.probe_epochs * 10):
            wb, st, l = step(wb, st)
        acc = float((jnp.argmax(x @ wb[0] + wb[1], -1) == y).mean())
        m = {"linear_probe_acc": acc, "final_loss": float(l)}
        print(m)
        return m


if __name__ == "__main__":
    run(parse_args())
