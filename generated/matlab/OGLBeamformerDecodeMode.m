classdef OGLBeamformerDecodeMode < int32
	enumeration
		None (0)
		Hadamard (1)
		Walsh (2)
	end
end