"""sepi_tpu — TPU-native speaker-embedding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``mycrazycracy/speaker-embedding-with-phonetic-information`` (the
Interspeech 2018 "Speaker Embedding Extraction with Phonetic Information"
Kaldi overlay; see ``/root/reference/README.md``).

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

- ``sepi_tpu.data``      — typed manifest tables replacing Kaldi data-dirs
                           (wav.scp/utt2spk/spk2utt/trials), chunk samplers
                           replacing the egs pipeline, augmentation.
- ``sepi_tpu.ops``       — DSP kernels (framing, MFCC/fbank, VAD, sliding
                           CMVN, deltas) as jitted XLA / Pallas programs,
                           replacing compute-mfcc-feats et al.
- ``sepi_tpu.models``    — Flax TDNN model zoo: v2 x-vector, AM net,
                           v3 multitask / v4 adaptation / v5 combined
                           c-vector, replacing nnet3 xconfig graphs.
- ``sepi_tpu.train``     — optimizer chain + single-task and multitask
                           trainers, replacing train_raw_dnn_new.py /
                           train_cvector_dnn.py + nnet3-train.
- ``sepi_tpu.parallel``  — device-mesh data parallelism via shard_map,
                           replacing run.pl fan-out + model averaging.
- ``sepi_tpu.classical`` — GMM-UBM and i-vector EM stacks.
- ``sepi_tpu.backend``   — mean/LDA/length-norm/PLDA scoring + adaptation.
- ``sepi_tpu.metrics``   — EER / minDCF / DET, replacing DETware MATLAB.
- ``sepi_tpu.recipes``   — declarative v1–v5 experiment drivers.
"""

__version__ = "0.1.0"
