classdef OGLBeamformerDecodeMode < int32
	enumeration
		None (0)
		Hadamard (1)
	end
end