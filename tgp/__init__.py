# tgp namespace package.
