from hsg_tpu.config.default import Config, default_config, update_config, load_config
