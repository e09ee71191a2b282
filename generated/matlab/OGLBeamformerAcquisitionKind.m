classdef OGLBeamformerAcquisitionKind < int32
	enumeration
		FORCES (0)
		UFORCES (1)
		HERCULES (2)
		RCA_VLS (3)
		RCA_TPW (4)
		UHERCULES (5)
		RACES (6)
		EPIC_FORCES (7)
		EPIC_UFORCES (8)
		EPIC_UHERCULES (9)
		Flash (10)
		HERO_PA (11)
		ULM (12)
	end
end