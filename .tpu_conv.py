import numpy as np
from graph_wavenet_tpu.config import DataConfig, ModelConfig, TrainConfig
from graph_wavenet_tpu.data.synthetic import load_dataset_syn
from graph_wavenet_tpu.train.engine import Engine
from graph_wavenet_tpu.train.runner import Runner

data_cfg = DataConfig(dataset="syn", num_nodes=40, n_communities=5,
                      seq_length=12, n_train=10, n_valid=3, n_test=2,
                      num_timestep=150, same_g=True)
data, adj, F_t, G = load_dataset_syn(data_cfg, batch_size=64, seed=0)
print("data ready", flush=True)
for dtype in ("float32", "bfloat16"):
    cfg = ModelConfig(num_nodes=40, out_dim=12, blocks=4, layers=2,
                      skip_channels=256, end_channels=512, n_supports=2,
                      dtype=dtype)
    tcfg = TrainConfig(epochs=3, save_dir="/tmp/convck_"+dtype, print_every=1000)
    engine = Engine(cfg, tcfg, data["scaler"])
    runner = Runner(engine, tcfg, log_fn=lambda *a: None)
    res = runner.fit_syn_shared(data, adj, G, F_t, 5)
    print(dtype, [round(h.valid["loss"], 4) for h in res.history], flush=True)
