"""Deterministically (re)generate the offline datamix fixture corpora.

Produces small JSONL manifests in this directory, each in its corpus's
*native* record schema (the same field names the reference's builders
read from TFDS/HF), so `corpus_configs.build_offline` exercises the real
field mappings:

* gsm8k.jsonl  — {question, answer} arithmetic word problems
* sciq.jsonl   — {question, support, correct_answer}
* mtnt.jsonl   — {src, dst} en->fr pairs
* mmlu_dev.jsonl / mmlu_test.jsonl — {question, choices, answer, subject}

Run: python tests/fixtures/datamix/generate.py
"""

import json
import os
import random

HERE = os.path.dirname(os.path.abspath(__file__))

NAMES = ["Ada", "Boris", "Carla", "Deniz", "Elif", "Farid", "Grace",
         "Hugo", "Ines", "Jun"]
ITEMS = ["apples", "books", "coins", "pencils", "shells", "stamps",
         "tokens", "marbles"]
ANIMALS = ["cat", "dog", "owl", "fox", "hen", "bee", "ant", "bat"]
FR_ANIMALS = {"cat": "chat", "dog": "chien", "owl": "hibou", "fox":
              "renard", "hen": "poule", "bee": "abeille", "ant": "fourmi",
              "bat": "chauve-souris"}
COLORS = ["red", "green", "blue", "yellow"]
FACTS = [("the sky on a clear day", "blue"), ("grass in summer", "green"),
         ("a ripe tomato", "red"), ("a ripe banana", "yellow"),
         ("a stop sign", "red"), ("a clear ocean", "blue"),
         ("a sunflower", "yellow"), ("a lime", "green")]
ELEMENTS = [("water", "hydrogen and oxygen"), ("salt", "sodium and "
            "chlorine"), ("rust", "iron and oxygen"),
            ("sand", "silicon and oxygen")]


def gen_gsm8k(rng, n):
  out = []
  for _ in range(n):
    name = rng.choice(NAMES)
    item = rng.choice(ITEMS)
    a, b = rng.randint(2, 20), rng.randint(2, 20)
    if rng.random() < 0.5:
      q = (f"{name} has {a} {item}. A friend gives {name} {b} more "
           f"{item}. How many {item} does {name} have now?")
      ans = (f"{name} starts with {a} {item} and gains {b}. "
             f"So {name} has {a} + {b} = {a + b} {item}. "
             f"The answer is {a + b}.")
    else:
      hi, lo = max(a, b), min(a, b)
      q = (f"{name} has {hi} {item} and gives away {lo}. "
           f"How many {item} are left?")
      ans = (f"{name} starts with {hi} {item} and loses {lo}. "
             f"So {hi} - {lo} = {hi - lo} {item} remain. "
             f"The answer is {hi - lo}.")
    out.append({"question": q, "answer": ans})
  return out


def gen_sciq(rng, n):
  out = []
  for _ in range(n):
    if rng.random() < 0.5:
      thing, color = rng.choice(FACTS)
      out.append({
          "question": f"What color is {thing}?",
          "support": f"Common observation: {thing} appears {color}.",
          "correct_answer": color})
    else:
      compound, parts = rng.choice(ELEMENTS)
      out.append({
          "question": f"Which elements make up {compound}?",
          "support": f"Chemistry: {compound} is composed of {parts}.",
          "correct_answer": parts})
  return out


def gen_mtnt(rng, n):
  templates = [("the {a} sees the {b}", "le {fa} voit le {fb}"),
               ("a {a} and a {b}", "un {fa} et un {fb}"),
               ("where is the {a}?", "ou est le {fa}?")]
  out = []
  for _ in range(n):
    a, b = rng.choice(ANIMALS), rng.choice(ANIMALS)
    en, fr = rng.choice(templates)
    out.append({
        "src": en.format(a=a, b=b),
        "dst": fr.format(fa=FR_ANIMALS[a], fb=FR_ANIMALS[b])})
  return out


def gen_mmlu(rng, n, subject):
  out = []
  for _ in range(n):
    if subject == "simple_arithmetic":
      a, b = rng.randint(2, 9), rng.randint(2, 9)
      gold = a + b
      opts = sorted({gold, gold + 1, gold - 1, gold + 2})
      rng.shuffle(opts)
      out.append({
          "question": f"What is {a} + {b}?",
          "choices": [str(o) for o in opts],
          "answer": opts.index(gold),
          "subject": subject})
    else:  # color_knowledge
      thing, color = rng.choice(FACTS)
      opts = list(COLORS)
      rng.shuffle(opts)
      out.append({
          "question": f"What color is {thing}?",
          "choices": opts,
          "answer": opts.index(color),
          "subject": subject})
  return out


def dump(name, records):
  path = os.path.join(HERE, name)
  with open(path, "w") as f:
    for r in records:
      f.write(json.dumps(r) + "\n")
  print(f"wrote {len(records):4d} records -> {path}")


def main():
  rng = random.Random(20260817)
  dump("gsm8k.jsonl", gen_gsm8k(rng, 150))
  dump("sciq.jsonl", gen_sciq(rng, 150))
  dump("mtnt.jsonl", gen_mtnt(rng, 150))
  dev = (gen_mmlu(rng, 5, "simple_arithmetic")
         + gen_mmlu(rng, 5, "color_knowledge"))
  test = (gen_mmlu(rng, 20, "simple_arithmetic")
          + gen_mmlu(rng, 20, "color_knowledge"))
  dump("mmlu_dev.jsonl", dev)
  dump("mmlu_test.jsonl", test)


if __name__ == "__main__":
  main()
